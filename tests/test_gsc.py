"""Parity tests for the GSC pipeline family vs. the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.array.alignment import fractional_delay_filter_bank, time_alignment_filters
from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.beamform import (
    FdGscConfig,
    GscConfig,
    SubbandGscConfig,
    TdGscConfig,
    ccafbounds,
    fdgsc_process,
    gsc_process,
    gsc_process_time,
    subband_gsc_process,
    tdgsc_process,
)
from distantspeech_tpu.ops.fir import fir_filter_block, fir_filter_offline


def _mic_array(M=4, r=0.032):
    refutil.patch_beamformer_base()
    ma_mod = refutil.load("DistantSpeech.beamformer.MicArray")
    return ma_mod.MicArray(arrayType="circular", r=r, M=M)


def _scene(M=4, S=16000, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.standard_normal(S)
    x = np.stack([np.roll(src, m) + 0.3 * rng.standard_normal(S) for m in range(M)], axis=0)
    return x


def test_fractional_delay_bank_parity():
    mr = refutil.load("DistantSpeech.transform.multirate")
    delays = np.array([0.0, 1.3, 2.9, 0.4])
    np.testing.assert_allclose(
        fractional_delay_filter_bank(delays), mr.fractional_delay_filter_bank(delays.copy()), atol=1e-12
    )


def test_ccafbounds_parity():
    cb = refutil.load("DistantSpeech.beamformer.ccafbounds")
    m = np.random.default_rng(0).standard_normal((3, 4)) * 0.05
    phi_ref, psi_ref = cb.ccafbounds(m, p=129, order=256)
    phi, psi = ccafbounds(m, p=129, order=256)
    np.testing.assert_allclose(phi, phi_ref, rtol=1e-12)
    np.testing.assert_allclose(psi, psi_ref, rtol=1e-12)


def test_time_alignment_parity():
    """Streaming FIR alignment matches TimeAlignment.process block by block."""
    mic = _mic_array()
    fb_mod = refutil.load("DistantSpeech.beamformer.fixedbeamformer")
    angle = np.array([197.0, 0.0]) / 180.0 * np.pi
    ta = fb_mod.TimeAlignment(mic, angle=angle)

    geom = ArrayGeometry.circular(4, 0.032)
    coeffs = time_alignment_filters(geom, angle)
    np.testing.assert_allclose(coeffs.T, ta.delay_filter, atol=1e-12)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 1024))
    K = coeffs.shape[-1]
    cache = jnp.zeros((4, K - 1), dtype=jnp.float64)
    for b in range(4):
        blk = x[:, b * 256 : (b + 1) * 256]
        out_ref = ta.process(blk.T)
        cache, out = fir_filter_block(cache, jnp.asarray(blk), jnp.asarray(coeffs))
        np.testing.assert_allclose(np.asarray(out).T, out_ref, atol=1e-10)

    # offline form equals streaming form
    offline = np.asarray(fir_filter_offline(jnp.asarray(x), jnp.asarray(coeffs)))
    ta2 = fb_mod.TimeAlignment(_mic_array(), angle=angle)
    ref_full = ta2.process(x.T).T
    np.testing.assert_allclose(offline, ref_full, atol=1e-10)


def test_gsc_frequency_parity():
    mic = _mic_array()
    gsc_mod = refutil.load("DistantSpeech.beamformer.GSC")
    ref = gsc_mod.GSC(mic, frameLen=256)
    # reference bit-rot: process hands its [F, T] output spectrum to an istft
    # that expects [F, T, C] (transform.py:462-466) — restore the intended call
    orig_istft = ref.transformer.istft
    ref.transformer.istft = lambda Y: orig_istft(Y[:, :, None] if Y.ndim == 2 else Y)
    # keep mu*|U|^2 < 2: the reference's canceller is UNnormalised LMS
    # (Pest pinned to 1, GSC.py:269-271) and diverges on unit-variance input
    x = _scene(M=4, S=256 * 24, seed=2) * 0.1
    angle = np.array([197.0, 0.0]) / 180.0 * np.pi
    out_ref = np.squeeze(ref.process(x, angle, method=2)["data"])

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    out = np.asarray(gsc_process(jnp.asarray(x), geom, tuple(angle), GscConfig(n_mics=4, frame_len=256)))
    n = min(len(out), len(out_ref))
    np.testing.assert_allclose(out[:n], out_ref[:n], rtol=1e-6, atol=1e-8)


def test_gsc_process_time_parity():
    """Time-domain GSC path vs the reference ``GSC.process1``
    (GSC.py:145-173): DC notch -> time alignment -> mean FBF ->
    adjacent-difference BM -> causal FLMS AIC with fir_truncate=30."""
    mic = _mic_array()
    gsc_mod = refutil.load("DistantSpeech.beamformer.GSC")
    ref = gsc_mod.GSC(mic, frameLen=256)
    x = _scene(M=4, S=256 * 16, seed=6) * 0.1
    out_ref = ref.process1(x.T.copy())

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    out = np.asarray(gsc_process_time(jnp.asarray(x), geom, frame_len=256))
    n = min(len(out), len(out_ref))
    np.testing.assert_allclose(out[:n], out_ref[:n], rtol=1e-6, atol=1e-8)


def test_tdgsc_parity():
    mic = _mic_array()
    mod = refutil.load("DistantSpeech.beamformer.TDGSC")
    ref = mod.TDGSC(mic, frameLen=256)
    x = _scene(M=4, S=256 * 16, seed=3)
    out_ref, p_ref, bm_ref = ref.process(x.T.copy())

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    out, p, bm = tdgsc_process(jnp.asarray(x), geom, cfg=TdGscConfig(n_mics=4, frame_len=256))
    np.testing.assert_allclose(np.asarray(bm).T, bm_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(p).T, p_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-6, atol=1e-8)


def test_fdgsc_parity():
    mic = _mic_array()
    mod = refutil.load("DistantSpeech.beamformer.FDGSC")
    ref = mod.FDGSC(mic, frameLen=256)
    x = _scene(M=4, S=256 * 16, seed=4)
    res = ref.process(x.T.copy())
    out_ref, p_ref, bm_ref = res[0], res[1], res[4]

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    out, p, bm = fdgsc_process(jnp.asarray(x), geom, cfg=FdGscConfig(n_mics=4, frame_len=256))
    np.testing.assert_allclose(np.asarray(p).T, p_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(bm).T, bm_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-6, atol=1e-7)


def test_subband_gsc_parity():
    mic = _mic_array()
    # reference bit-rot: SubbandGSC.py:23 imports DelayObj from FDGSC, where
    # it no longer exists (the class it actually uses is its own local copy)
    fdgsc_mod = refutil.load("DistantSpeech.beamformer.FDGSC")
    if not hasattr(fdgsc_mod, "DelayObj"):
        flms_mod = refutil.load("DistantSpeech.adaptivefilter.FastFreqLms")
        fdgsc_mod.DelayObj = flms_mod.DelayObj
    mod = refutil.load("DistantSpeech.beamformer.SubbandGSC")
    ref = mod.SubbandGSC(mic, frameLen=256)
    x = _scene(M=4, S=256 * 12, seed=5)
    out_ref, fix_ref, bm_ref, p_ref, aligned_ref = ref.process(x.copy())

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    out, p, bm = subband_gsc_process(jnp.asarray(x), geom, cfg=SubbandGscConfig(n_mics=4, frame_len=256))
    # p passes through McSpp's complex matrix inverses; float noise ~1e-6
    np.testing.assert_allclose(np.asarray(p).T, p_ref, atol=3e-5)
    np.testing.assert_allclose(np.asarray(bm).T, bm_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-5, atol=1e-6)


def test_subband_gsc_guard_options():
    """Round-5 conditioning knobs: aic_warmup_frames freezes the canceller
    while McSpp initialises (its output then differs from the reference
    path), aic_freeze_thresh hard-gates on p; defaults stay reference-exact
    (covered by test_subband_gsc_parity)."""
    x = _scene(M=4, S=256 * 10, seed=9)
    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    xj = jnp.asarray(x)
    base = np.asarray(subband_gsc_process(xj, geom, cfg=SubbandGscConfig(n_mics=4))[0])
    out_w = np.asarray(subband_gsc_process(
        xj, geom, cfg=SubbandGscConfig(n_mics=4, aic_warmup_frames=5))[0])
    assert np.all(np.isfinite(out_w))
    assert np.max(np.abs(out_w - base)) > 1e-7 * np.max(np.abs(base))
    # the hard threshold may or may not bind on this scene; it must stay
    # finite and reduce to the reference behaviour when it never binds
    out_f = np.asarray(subband_gsc_process(
        xj, geom, cfg=SubbandGscConfig(n_mics=4, aic_freeze_thresh=0.999))[0])
    assert np.all(np.isfinite(out_f))


def test_subband_gsc_finite_f32_reverberant():
    """Round-5 float32 robustness: on a reverberant speech-like scene the
    McCDR radicand cancels to a tiny negative under XLA's fused float32
    arithmetic (sqrt(-eps) = NaN) and cdr_p can underflow to exactly 0
    (q = 1, inf * exp(-huge) = NaN in the McSpp p) — both NaNs then smear
    through the synthesis matmuls.  The clamps are exact no-ops whenever
    the float64 reference path is well-defined (parity suites unchanged)."""
    import jax
    from distantspeech_tpu.sim import RoomConfig, generate_scene

    with jax.enable_x64(False):
        rng = np.random.default_rng(0)
        fs, dur = 16000, 4.0
        t = np.arange(int(fs * dur)) / fs
        env = (np.sin(2 * np.pi * 0.7 * t + 0.5) > -0.3).astype(np.float32)
        src = (np.convolve(rng.standard_normal(len(t)), np.hanning(9) / 4.5, "same")
               * env).astype(np.float32)
        geom = ArrayGeometry.linear(4, 0.032)
        mix = generate_scene(src, geom.mic_loc, source_angle=90.0, snr=20.0,
                             cfg=RoomConfig(), seed=1).astype(np.float32)
        out, p, bm = subband_gsc_process(
            jnp.asarray(mix), geom, (np.pi / 2, 0.0), SubbandGscConfig(n_mics=4))
        assert np.all(np.isfinite(np.asarray(out)))
        assert np.all(np.isfinite(np.asarray(p)))


def test_gsc_normalized_aic_stable_f32():
    """The reference's unnormalised LMS canceller diverges on loud broadband
    input (sooner in complex64); the opt-in power normalisation — the
    reference's own commented-out recursion (GSC.py:270-274) — must stay
    finite where the default faithfully blows up."""
    import jax.numpy as jnp
    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.beamform import GscConfig, gsc_process

    rng = np.random.default_rng(0)
    geom = ArrayGeometry.linear(4, 0.032)
    cfg = GscConfig(n_mics=4, normalize_aic=True, spp_rel_diag=1e-5)
    # (a) loud broadband noise — diverges the unnormalised canceller
    x = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32))
    y = np.asarray(gsc_process(x, geom, (np.pi / 2, 0.0), cfg))
    assert np.isfinite(y).all()
    # (b) near-coherent target — rank-1 Phi_vv breaks the f32 MC-MCRA inverse
    burst = rng.standard_normal(16000).astype(np.float32)
    xc = jnp.asarray(np.tile(burst, (4, 1)) + 0.3 * rng.standard_normal((4, 16000)).astype(np.float32))
    yc = np.asarray(gsc_process(xc, geom, (np.pi / 2, 0.0), cfg))
    assert np.isfinite(yc).all()


def test_gsc_process1_parity():
    """Time-domain GSC path (GSC.process1, GSC.py:145-173): DC-notch ->
    alignment -> mean FBF -> adjacent-difference BM -> causal full-rate
    FLMS, frame-exact vs the reference."""
    from distantspeech_tpu.beamform import gsc_process_time

    mic = _mic_array()
    mod = refutil.load("DistantSpeech.beamformer.GSC")
    ref = mod.GSC(mic, frameLen=256, angle=[197, 0])
    x = _scene(M=4, S=256 * 16, seed=6)
    out_ref = ref.process1(x.T.copy())

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    out = np.asarray(gsc_process_time(jnp.asarray(x), geom, (197.0 / 180.0 * np.pi, 0.0)))
    np.testing.assert_allclose(out, out_ref[: len(out)], rtol=1e-6, atol=1e-8)
