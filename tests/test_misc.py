"""Tests for Griffin-Lim, profiling harness, and multirate extras."""

import numpy as np
import jax.numpy as jnp

import refutil
from distantspeech_tpu.runtime.profiling import Timer, stage_metrics
from distantspeech_tpu.transform import StftConfig, analysis
from distantspeech_tpu.transform.griffin_lim import griffin_lim
from distantspeech_tpu.transform.multirate import low_pass, overlap_save, resample


def test_griffin_lim_reconstructs():
    cfg = StftConfig(256, 128)
    rng = np.random.default_rng(0)
    # tonal signal: GL converges well on sparse spectra
    t = np.arange(128 * 40) / 16000.0
    x = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 950 * t)
    mag = jnp.abs(analysis(jnp.asarray(x), cfg))
    y = np.asarray(griffin_lim(mag, cfg, n_iter=60))
    mag_y = np.abs(np.asarray(analysis(jnp.asarray(y), cfg)))
    # compare interior frames: the fresh-stream transform semantics garble
    # the first/last hop of every iteration (boundary, not GL, error)
    a, b = np.asarray(mag)[3:-3], mag_y[3:-3]
    err = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert err < 0.2, err  # ~ -16 dB spectral convergence, typical for 60 GL iters


def test_overlap_save_matches_convolution():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4000)
    h = rng.standard_normal(64)
    y = np.asarray(overlap_save(jnp.asarray(x), jnp.asarray(h), stride=4))
    ref = np.convolve(x, h)
    # reference semantics: with pad_start the output aligns to the linear conv
    n = min(len(y), len(ref)) - 200
    np.testing.assert_allclose(y[100 : n], ref[100 : n], atol=1e-8)


def test_overlap_save_vs_reference():
    mod = refutil.load("DistantSpeech.common.OverlapSave")
    rng = np.random.default_rng(2)
    x = rng.standard_normal(2000)
    h = rng.standard_normal(32)
    y_ref = mod.overlap_save(x.copy(), h.copy(), stride=4)
    y = np.asarray(overlap_save(jnp.asarray(x), jnp.asarray(h), stride=4))
    np.testing.assert_allclose(y, y_ref, atol=1e-10)


def test_low_pass_and_resample():
    h = low_pass(65, 0.2)
    assert h.shape == (65,)
    x = np.sin(2 * np.pi * 100 * np.arange(8000) / 16000)
    y = resample(x, 1, 2)  # downsample by 2
    assert abs(len(y) - 4000) <= 2
    assert np.isfinite(y).all()


def test_frac_delay_minimax():
    """frac_delay solves the Putnam-Smith Chebyshev design (reference
    multirate.py:54-113) without cvxopt: the minimax objective must match
    an independent SLSQP solve of the same SOCP epigraph to <1%, beat the
    windowed-sinc design, and recover an exact impulse for integer delay."""
    from scipy.optimize import minimize

    from distantspeech_tpu.transform.multirate import frac_delay

    # integer delay has an exact solution (a shifted impulse, zero error)
    h = frac_delay(3.0, 8)
    np.testing.assert_allclose(h, np.eye(8)[3], atol=1e-9)

    delta, N, C, w_max = 1.7, 8, 4, 0.9
    N_C = C * N
    w = np.linspace(0, w_max * np.pi, N_C)
    F = np.exp(-1j * w[:, None] * np.arange(N))
    d = np.exp(-1j * w * delta)

    h = frac_delay(delta, N, w_max, C)
    e = np.abs(F @ h - d).max()

    cons = [
        {"type": "ineq", "fun": (lambda x, i=i: x[-1] - abs(F[i] @ x[:-1] - d[i]))}
        for i in range(N_C)
    ]
    r = minimize(
        lambda x: x[-1], np.concatenate([h, [e * 1.5]]), constraints=cons,
        method="SLSQP", options={"maxiter": 500, "ftol": 1e-14},
    )
    e_ref = np.abs(F @ r.x[:-1] - d).max()
    assert e <= e_ref * 1.01, (e, e_ref)

    # must beat the same-length windowed sinc over the design band
    sinc = np.sinc(np.arange(N) - delta) * np.hanning(N)
    e_sinc = np.abs(F @ sinc - d).max()
    assert e < 0.5 * e_sinc, (e, e_sinc)


def test_timer_and_metrics():
    with Timer("stft", audio_seconds=2.0) as t:
        sum(range(1000))
    assert t.elapsed > 0 and t.realtime_factor > 0
    m = stage_metrics("bf", np.ones(100), 0.5 * np.ones(100), p=np.array([0.9, 0.1]))
    assert abs(m["energy_ratio_db"] - 10 * np.log10(0.25)) < 1e-9
    assert m["p_active_frac"] == 0.5


def test_phase_correction_parity():
    from distantspeech_tpu.stats import phase_correction

    beamformer = refutil.load("DistantSpeech.beamformer.beamformer")
    rng = np.random.default_rng(3)
    w = rng.standard_normal((65, 4)) + 1j * rng.standard_normal((65, 4))
    ref = beamformer.phase_correction(w.copy())
    ours = np.asarray(phase_correction(jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-10)


def test_awgn_parity():
    from distantspeech_tpu.adaptive import awgn

    base = refutil.load("DistantSpeech.adaptivefilter.BaseFilter")
    rng = np.random.default_rng(4)
    x = rng.standard_normal(4096)
    np.testing.assert_allclose(awgn(x, 10.0), base.awgn(x, 10), rtol=0, atol=0)


def test_evaluation_metrics():
    """stats.evaluation: SI-SDR/segSNR behave like the published formulas
    (the reference only calls pesq/pystoi in demo mains, mcspp_base.py:394-403)."""
    from distantspeech_tpu.stats import best_aligned_si_sdr, segmental_snr_db, si_sdr, snr_db

    rng = np.random.default_rng(0)
    ref = rng.standard_normal(8000)
    assert si_sdr(3.7 * ref, ref) > 80  # scale-invariant
    noisy = ref + 0.1 * rng.standard_normal(8000)
    v = si_sdr(noisy, ref)
    assert 15 < v < 25  # 0.1 noise on unit signal -> ~20 dB
    assert si_sdr(noisy + 0.4 * rng.standard_normal(8000), ref) < v  # monotone
    # lag search recovers a shifted estimate — in BOTH directions (an
    # estimate can lead its reference under trimming conventions)
    assert best_aligned_si_sdr(np.concatenate([np.zeros(37), ref]), ref, max_lag=50) > 80
    assert best_aligned_si_sdr(ref[37:], ref, max_lag=50) > 80
    # lags beyond the signal length are skipped, not scored as spurious 0 dB
    short = ref[:20]
    assert best_aligned_si_sdr(3.7 * short, short, max_lag=400) > 80
    assert abs(snr_db(ref, 0.1 * ref) - 20.0) < 1e-6
    assert segmental_snr_db(ref, ref) == 35.0  # clamped at the ceiling
    assert segmental_snr_db(noisy, ref) < 35.0
