"""Fused SubbandGSC Pallas kernel vs the scan path (interpret mode).

The scan path is itself frame-exact against the reference SubbandGSC
(tests/test_gsc.py::test_subband_gsc_parity, test_real_audio.py), so
scan-vs-fused closes the chain to SubbandGSC.process
(/root/reference/DistantSpeech/beamformer/SubbandGSC.py:170-263)."""

import numpy as np
import jax.numpy as jnp
import pytest

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.beamform.subband_gsc import SubbandGscConfig, subband_gsc_process
from distantspeech_tpu.ops.pallas_sgsc import fullbin_dft_matrices, fused_subband_gsc

ANG = (np.pi / 2, 0.0)


def _scene(B=8, M=4, S=256 * 16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, M, S)).astype(np.float32))


def test_fullbin_dft_roundtrip():
    CSF, ABF = fullbin_dft_matrices(512, 256, 384)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 512))
    Z = x @ CSF
    # full-bin layout: re bins on 0..256, im on 384..640; im of bins 0/256
    # EXACTLY zero (the kernel's complex-arithmetic invariant)
    ref = np.fft.rfft(x * np.hanning(513)[:512] ** 0 * 1.0, axis=-1)  # window folded in CSF
    assert np.all(Z[:, 384] == 0.0)
    assert np.all(Z[:, 384 + 256] == 0.0)
    assert np.all(Z[:, 257:384] == 0.0)
    assert np.all(Z[:, 384 + 257 :] == 0.0)


def test_fused_sgsc_matches_scan():
    x = _scene()
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = SubbandGscConfig(n_mics=4)
    o1, p1, bm1 = subband_gsc_process(x, geom, ANG, cfg)
    o2, p2, bm2 = subband_gsc_process(x, geom, ANG, cfg, backend="fused")
    scale = np.max(np.abs(np.asarray(o1))) + 1e-12
    assert np.max(np.abs(np.asarray(o1) - np.asarray(o2))) / scale < 1e-4
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-3)
    sb = np.max(np.abs(np.asarray(bm1))) + 1e-12
    assert np.max(np.abs(np.asarray(bm1) - np.asarray(bm2))) / sb < 1e-4


def test_fused_sgsc_guards_match_scan():
    x = _scene(S=256 * 10, seed=3)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = SubbandGscConfig(n_mics=4, aic_warmup_frames=4, aic_freeze_thresh=0.5)
    o1 = subband_gsc_process(x, geom, ANG, cfg)[0]
    o2 = subband_gsc_process(x, geom, ANG, cfg, backend="fused")[0]
    scale = np.max(np.abs(np.asarray(o1))) + 1e-12
    assert np.max(np.abs(np.asarray(o1) - np.asarray(o2))) / scale < 1e-4


def test_fused_sgsc_chunking_invariance():
    x = _scene(S=256 * 12, seed=2)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = SubbandGscConfig(n_mics=4)
    a = fused_subband_gsc(x, geom, ANG, cfg, interpret=True, t_chunk=12)[0]
    b = fused_subband_gsc(x, geom, ANG, cfg, interpret=True, t_chunk=5)[0]  # padded frames
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_sgsc_rejects_bad_shapes():
    geom = ArrayGeometry.linear(4, 0.032)
    with pytest.raises(ValueError):
        fused_subband_gsc(_scene(B=3), geom, ANG, SubbandGscConfig(), interpret=True)
    with pytest.raises(ValueError):
        fused_subband_gsc(
            jnp.zeros((8, 6, 4096)), geom, ANG, SubbandGscConfig(n_mics=6), interpret=True)
