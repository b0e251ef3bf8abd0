"""Fused FLMS/GSC Pallas kernels vs their scan references (interpret mode).

The scan paths are themselves parity-tested against the reference classes
(test_gsc.py), so scan-vs-fused closes the chain to TDGSC.process
(/root/reference/DistantSpeech/beamformer/TDGSC.py:110-172)."""

import numpy as np
import jax.numpy as jnp
import pytest

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.beamform.tdgsc import TdGscConfig, tdgsc_process
from distantspeech_tpu.ops.pallas_flms import fused_tdgsc, plain_dft_packed

ANG = (np.pi / 2, 0.0)


def _scene(B=8, M=4, S=4096, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, M, S)).astype(np.float32))


def test_plain_dft_packed_roundtrip():
    n = 512
    CS, AB = plain_dft_packed(n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, n))
    Z = x @ CS
    xr = Z @ AB
    np.testing.assert_allclose(xr, x, atol=1e-10)
    # packed planes match numpy rfft
    F = n // 2 + 1
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(Z[:, : n // 2], np.real(ref)[:, :-1], atol=1e-9)
    np.testing.assert_allclose(Z[:, n // 2], np.real(ref)[:, -1], atol=1e-9)
    np.testing.assert_allclose(Z[:, n // 2 + 1 :], np.imag(ref)[:, 1:-1], atol=1e-9)


def test_fused_tdgsc_matches_scan():
    x = _scene()
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = TdGscConfig(n_mics=4)
    o1, p1, bm1 = tdgsc_process(x, geom, ANG, cfg)
    o2, p2, bm2 = fused_tdgsc(x, geom, ANG, cfg, interpret=True)
    scale = np.max(np.abs(np.asarray(o1))) + 1e-12
    assert np.max(np.abs(np.asarray(o1) - np.asarray(o2))) / scale < 1e-5
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bm1), np.asarray(bm2), atol=1e-6)


def test_fused_tdgsc_vad_guard_matches_scan():
    """The round-5 vad_guard (AIC frozen where raw S/Smin says speech)
    follows the scan path bit-closely in-kernel.  A speech-like modulated
    burst drives the indicator across its threshold so the guard actually
    binds (verified: guarded and unguarded outputs differ)."""
    rng = np.random.default_rng(3)
    B, M, S = 8, 4, 4096
    env = (np.sin(2 * np.pi * 5.0 * np.arange(S) / 16000) > 0).astype(np.float32)
    x = rng.standard_normal((B, M, S)).astype(np.float32) * (0.2 + env)
    x = jnp.asarray(x)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = TdGscConfig(n_mics=4, vad_guard=True)
    o1, p1, _ = tdgsc_process(x, geom, ANG, cfg)
    o2, p2, _ = fused_tdgsc(x, geom, ANG, cfg, interpret=True)
    scale = np.max(np.abs(np.asarray(o1))) + 1e-12
    assert np.max(np.abs(np.asarray(o1) - np.asarray(o2))) / scale < 1e-5
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    o_ref = tdgsc_process(x, geom, ANG, TdGscConfig(n_mics=4))[0]
    assert np.max(np.abs(np.asarray(o_ref) - np.asarray(o1))) / scale > 1e-4


def test_fused_tdgsc_chunking_invariance():
    x = _scene(S=4096)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = TdGscConfig(n_mics=4)
    a = fused_tdgsc(x, geom, ANG, cfg, interpret=True, t_chunk=16)[0]
    b = fused_tdgsc(x, geom, ANG, cfg, interpret=True, t_chunk=7)[0]  # padded frames
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_tdgsc_sub_batching():
    x = _scene(B=16, S=2048)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = TdGscConfig(n_mics=4)
    a = fused_tdgsc(x, geom, ANG, cfg, interpret=True)[0]
    b = fused_tdgsc(x, geom, ANG, cfg, interpret=True, sub=16)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_tdgsc_rejects_bad_shapes():
    geom = ArrayGeometry.linear(4, 0.032)
    with pytest.raises(ValueError):
        fused_tdgsc(_scene(B=3), geom, ANG, TdGscConfig(), interpret=True)


def test_fused_fdgsc_matches_scan():
    from distantspeech_tpu.beamform.fdgsc import FdGscConfig, fdgsc_process

    x = _scene(S=256 * 20, seed=2)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = FdGscConfig(n_mics=4)
    o1, p1, bm1 = fdgsc_process(x, geom, ANG, cfg)
    o2, p2, bm2 = fdgsc_process(x, geom, ANG, cfg, backend="fused")
    scale = np.max(np.abs(np.asarray(o1))) + 1e-12
    assert np.max(np.abs(np.asarray(o1) - np.asarray(o2))) / scale < 1e-5
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    bscale = np.max(np.abs(np.asarray(bm1))) + 1e-12
    assert np.max(np.abs(np.asarray(bm1) - np.asarray(bm2))) / bscale < 1e-5


def test_fused_fdgsc_chunking_invariance():
    from distantspeech_tpu.beamform.fdgsc import FdGscConfig
    from distantspeech_tpu.ops.pallas_flms import fused_fdgsc

    x = _scene(S=256 * 10, seed=3)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = FdGscConfig(n_mics=4)
    a = fused_fdgsc(x, geom, ANG, cfg, interpret=True, t_chunk=10)[0]
    b = fused_fdgsc(x, geom, ANG, cfg, interpret=True, t_chunk=4)[0]  # padded
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_tdgsc_postfilter_matches_scan():
    """OMLSA-multi fused in-kernel (windowed STFTs, (1+C) MCRA trackers,
    TBRR gain, ISTFT overlap-add) vs the scan path's tdgsc_step
    postfilter branch."""
    x = _scene(S=256 * 24, seed=4)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = TdGscConfig(n_mics=4, postfilter=True)
    o1, p1, _ = tdgsc_process(x, geom, ANG, cfg)
    o2, p2, _ = fused_tdgsc(x, geom, ANG, cfg, interpret=True)
    scale = np.max(np.abs(np.asarray(o1))) + 1e-12
    assert np.max(np.abs(np.asarray(o1) - np.asarray(o2))) / scale < 1e-4
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_fused_kws_matches_scan():
    from distantspeech_tpu.kws.dual_mic import DualMicKwsConfig, kws_process
    from distantspeech_tpu.ops.pallas_flms import fused_kws

    rng = np.random.default_rng(5)
    B, S = 8, 256 * 100  # past the 94-frame defer FIFO wrap
    src = rng.standard_normal((B, S))
    x = np.stack(
        [src, np.roll(src, 3, axis=-1) * 0.8 + 0.1 * rng.standard_normal((B, S))], axis=1
    ).astype(np.float32)
    cfg = DualMicKwsConfig()
    want = np.asarray(kws_process(jnp.asarray(x), cfg))
    got = np.asarray(fused_kws(jnp.asarray(x), cfg, interpret=True))
    scale = np.max(np.abs(want)) + 1e-12
    assert np.max(np.abs(want - got)) / scale < 1e-5


def test_fused_aec_matches_scan():
    from distantspeech_tpu.adaptive.aec import AecConfig, aec_init, aec_step
    from distantspeech_tpu.ops.pallas_aec import fused_aec
    import jax

    B, M, S, L = 8, 4, 256 * 20, 256
    T = S // L
    rng = np.random.default_rng(6)
    far = (rng.standard_normal((B, S)) * 0.5).astype(np.float32)
    h = rng.standard_normal(64) * np.exp(-np.arange(64) / 12)
    echo = np.stack([np.convolve(far[b], h)[:S] for b in range(B)]).astype(np.float32)
    x = (0.1 * rng.standard_normal((B, M, S)).astype(np.float32) + echo[:, None, :])
    cfg = AecConfig(filter_len=512, num_block=2)

    xb = jnp.moveaxis(jnp.asarray(x).reshape(B, M, T, L), 2, 0)
    fb = jnp.moveaxis(jnp.asarray(far).reshape(B, T, L), 1, 0)

    def body(s, blk):
        farb = jnp.broadcast_to(blk[1][..., None, :], blk[0].shape)
        s2, (ef, _) = aec_step(cfg, s, farb, blk[0])
        return s2, ef

    _, ef = jax.lax.scan(body, aec_init(cfg, (B, M)), (xb, fb))
    want = np.asarray(jnp.moveaxis(ef, 0, 2).reshape(B, M, S))
    got = np.asarray(fused_aec(jnp.asarray(far), jnp.asarray(x), cfg, interpret=True))
    scale = np.max(np.abs(want)) + 1e-12
    assert np.max(np.abs(want - got)) / scale < 1e-5


def test_fused_full_stack_matches_scan():
    """BASELINE config 5 as three chained Pallas kernels (AEC -> KWS ->
    TDGSC+OMLSA) vs the monolithic block scan."""
    from distantspeech_tpu.runtime.full_stack import FullStackConfig, full_stack_process

    B, M, S = 8, 4, 256 * 20
    rng = np.random.default_rng(7)
    far = (rng.standard_normal((B, S)) * 0.5).astype(np.float32)
    h = rng.standard_normal(64) * np.exp(-np.arange(64) / 12)
    echo = np.stack([np.convolve(far[b], h)[:S] for b in range(B)]).astype(np.float32)
    x = (0.1 * rng.standard_normal((B, M, S)).astype(np.float32) + echo[:, None, :])
    geom = ArrayGeometry.linear(M, 0.032)
    cfg = FullStackConfig(n_mics=M)
    o1, k1, p1 = full_stack_process(jnp.asarray(x), jnp.asarray(far), geom, ANG, cfg)
    o2, k2, p2 = full_stack_process(jnp.asarray(x), jnp.asarray(far), geom, ANG, cfg, backend="fused")
    scale = np.max(np.abs(np.asarray(o1))) + 1e-12
    assert np.max(np.abs(np.asarray(o1) - np.asarray(o2))) / scale < 1e-4
    # 1e-4, not 1e-5: the KWS tap adapts on the AEC output, so the AEC
    # kernel's ~1e-6 rounding differences are amplified by a second
    # adaptive filter before comparison
    kscale = np.max(np.abs(np.asarray(k1))) + 1e-12
    assert np.max(np.abs(np.asarray(k1) - np.asarray(k2))) / kscale < 1e-4
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
