"""Interpreter-mode exactness of the fully-fused flagship fast path
(ops.pallas_enhance) against the pure scan pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.array.steering import steering_vector
from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_process
from distantspeech_tpu.beamform.mvdr import MvdrConfig
from distantspeech_tpu.ops.pallas_enhance import fused_enhance, fused_enhance_full


def _scene(B, M, S, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(S) / 16000
    env = (np.sin(2 * np.pi * 1.3 * t) > 0).astype(np.float32)
    tgt = (env * rng.standard_normal(S)).astype(np.float32)
    x = 0.3 * rng.standard_normal((B, M, S)).astype(np.float32) + tgt[None, None, :]
    return x


@pytest.mark.parametrize("rel_diag", [0.0, 1e-3])
def test_fused_enhance_matches_scan(rel_diag):
    B, M, S = 8, 4, 128 * 40
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=15, rel_diag=rel_diag))
    geom = ArrayGeometry.linear(M, 0.032)
    x = jnp.asarray(_scene(B, M, S))
    steer = np.asarray(
        steering_vector(geom, np.array([np.pi / 2, 0.0]), cfg.stft.n_fft), dtype=np.complex64
    )

    want = np.asarray(enhance_process(x, geom, (90.0, 0.0), cfg, backend="scan"))
    got = np.asarray(fused_enhance(x, steer, cfg, interpret=True))
    assert got.shape == want.shape
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=2e-3)


def test_fused_enhance_t_chunk_padding():
    """T with no usable divisor exercises the frame-padding fallback."""
    B, M = 8, 2
    T = 37  # prime-ish frame count
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=15))
    geom = ArrayGeometry.linear(M, 0.032)
    x = jnp.asarray(_scene(B, M, 128 * T, seed=1))
    steer = np.asarray(
        steering_vector(geom, np.array([np.pi / 2, 0.0]), cfg.stft.n_fft), dtype=np.complex64
    )
    want = np.asarray(enhance_process(x, geom, (90.0, 0.0), cfg, backend="scan"))
    got = np.asarray(fused_enhance(x, steer, cfg, interpret=True))
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=2e-3)


def test_fused_enhance_unaligned_length():
    """Arbitrary (non-hop-multiple) lengths drop the sub-hop tail exactly like
    the scan path's frame truncation, instead of a reshape error."""
    B, M = 8, 2
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=15))
    geom = ArrayGeometry.linear(M, 0.032)
    x = jnp.asarray(_scene(B, M, 128 * 24 + 77, seed=2))
    steer = np.asarray(
        steering_vector(geom, np.array([np.pi / 2, 0.0]), cfg.stft.n_fft), dtype=np.complex64
    )
    want = np.asarray(enhance_process(x[..., : 128 * 24], geom, (90.0, 0.0), cfg, backend="scan"))
    got = np.asarray(fused_enhance(x, steer, cfg, interpret=True))
    assert got.shape == want.shape
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=2e-3)


@pytest.mark.parametrize("rel_diag", [0.0, 1e-3])
def test_fused_enhance_full_matches_scan(rel_diag):
    """The mega-fused kernel (in-kernel analysis/synthesis/overlap-add and
    in-lane MCRA smoothing) against the pure scan pipeline."""
    B, M, S = 8, 4, 128 * 40
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=15, rel_diag=rel_diag))
    geom = ArrayGeometry.linear(M, 0.032)
    x = jnp.asarray(_scene(B, M, S))
    steer = np.asarray(
        steering_vector(geom, np.array([np.pi / 2, 0.0]), cfg.stft.n_fft), dtype=np.complex64
    )

    want = np.asarray(enhance_process(x, geom, (90.0, 0.0), cfg, backend="scan"))
    got = np.asarray(fused_enhance_full(x, steer, cfg, interpret=True))
    assert got.shape == want.shape
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=2e-3)


def test_fused_enhance_full_sub16_identical():
    """The sublane-tile width (batch rows per vreg op) must not change the
    numbers at all — same ops, different packing."""
    B, M, S = 16, 2, 128 * 24
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=15))
    geom = ArrayGeometry.linear(M, 0.032)
    x = jnp.asarray(_scene(B, M, S, seed=4))
    steer = np.asarray(
        steering_vector(geom, np.array([np.pi / 2, 0.0]), cfg.stft.n_fft), dtype=np.complex64
    )
    a = np.asarray(fused_enhance_full(x, steer, cfg, interpret=True))
    b = np.asarray(fused_enhance_full(x, steer, cfg, interpret=True, sub=16))
    np.testing.assert_array_equal(a, b)


def test_fused_enhance_full_vs_fused():
    """Direct parity between the two fused implementations (VERDICT r2 #5):
    the benched kernel and the partially-fused one can't silently diverge."""
    B, M, S = 8, 4, 128 * 37 + 55  # unaligned length + frame-padding fallback
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=15, rel_diag=1e-3))
    geom = ArrayGeometry.linear(M, 0.032)
    x = jnp.asarray(_scene(B, M, S, seed=3))
    steer = np.asarray(
        steering_vector(geom, np.array([np.pi / 2, 0.0]), cfg.stft.n_fft), dtype=np.complex64
    )
    a = np.asarray(fused_enhance(x, steer, cfg, interpret=True))
    b = np.asarray(fused_enhance_full(x, steer, cfg, interpret=True))
    assert a.shape == b.shape
    scale = np.max(np.abs(a))
    np.testing.assert_allclose(b, a, atol=1e-5 * scale, rtol=1e-5)


def test_fused_enhance_validation():
    cfg = EnhanceConfig()
    x = jnp.zeros((6, 2, 1280), jnp.float32)  # B not a multiple of 8
    with pytest.raises(ValueError, match="B % 8"):
        fused_enhance(x, np.ones((129, 2), np.complex64), cfg, interpret=True)


@pytest.mark.parametrize("vad_guard", [False, True])
def test_fused_enhance_full_rank1_matches_ldl(vad_guard):
    """inv_mode='rank1' (LDL warmup chunk -> Bennett rank-1 factor updates)
    against the per-frame-LDL kernel, across several frame chunks so the
    steady-state Bennett path does most of the work.  Guard-off is the
    tight contract (loading decay only); vad_guard's sparse update gate is
    the hard case for factor tracking (cond(Rvv+dI) ~ 1e4-1e6 on rarely
    updated lanes — the Sherman-Morrison inverse recursion DIVERGES here,
    which is why the rank-1 path tracks factors instead)."""
    B, M, S = 8, 4, 128 * 60
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=15, vad_guard=vad_guard))
    geom = ArrayGeometry.linear(M, 0.032)
    x = jnp.asarray(_scene(B, M, S, seed=5))
    steer = np.asarray(
        steering_vector(geom, np.array([np.pi / 2, 0.0]), cfg.stft.n_fft), dtype=np.complex64
    )
    a = np.asarray(fused_enhance_full(x, steer, cfg, interpret=True, t_chunk=12))
    b = np.asarray(fused_enhance_full(x, steer, cfg, interpret=True, t_chunk=12, inv_mode="rank1"))
    assert a.shape == b.shape
    scale = np.max(np.abs(a))
    tol = 2e-2 if vad_guard else 1e-3  # decision-flip vs tight (bench.py gates)
    np.testing.assert_allclose(b, a, atol=tol * scale, rtol=tol)


def test_fused_enhance_full_rank1_single_chunk_is_ldl():
    """With T <= t_chunk the whole run is the warmup chunk: rank1 mode must
    be bit-identical to the LDL kernel (the handover conversion runs after
    the last frame and is unobservable)."""
    B, M, S = 8, 2, 128 * 20
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=15))
    geom = ArrayGeometry.linear(M, 0.032)
    x = jnp.asarray(_scene(B, M, S, seed=6))
    steer = np.asarray(
        steering_vector(geom, np.array([np.pi / 2, 0.0]), cfg.stft.n_fft), dtype=np.complex64
    )
    a = np.asarray(fused_enhance_full(x, steer, cfg, interpret=True))
    b = np.asarray(fused_enhance_full(x, steer, cfg, interpret=True, inv_mode="rank1"))
    np.testing.assert_array_equal(a, b)


def test_fused_enhance_full_rank1_validation():
    cfg = EnhanceConfig()
    x = jnp.zeros((8, 2, 1280), jnp.float32)
    with pytest.raises(ValueError, match="inv_mode"):
        fused_enhance_full(x, np.ones((129, 2), np.complex64), cfg, interpret=True, inv_mode="sm")
