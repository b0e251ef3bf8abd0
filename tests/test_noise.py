"""Parity tests for noise / speech-presence estimators vs. the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.noise import McraConfig, mcra_run


def _spectrum_fixture(T=220, nfft=256, seed=0):
    """Synthetic noisy power spectrogram with a speech-like burst."""
    rng = np.random.default_rng(seed)
    F = nfft // 2 + 1
    noise = rng.rayleigh(1.0, size=(T, F)) ** 2
    burst = np.zeros((T, F))
    t0, t1 = int(T * 0.4), int(T * 0.7)
    burst[t0:t1, 10:60] = 40.0 * rng.rayleigh(1.0, size=(t1 - t0, 50)) ** 2
    return noise + burst


@pytest.mark.parametrize("nfft", [256, 320])
def test_mcra_parity(nfft):
    mcra_mod = refutil.load("DistantSpeech.noise_estimation.mcra")
    T = 220
    Y = _spectrum_fixture(T=T, nfft=nfft)

    ref = mcra_mod.NoiseEstimationMCRA(nfft=nfft)
    lam_ref = np.zeros_like(Y)
    p_ref = np.zeros_like(Y)
    for t in range(T):
        ref.estimation(Y[t])
        lam_ref[t] = ref.lambda_d
        p_ref[t] = ref.p

    cfg = McraConfig(nfft=nfft)
    lam, p = mcra_run(cfg, jnp.asarray(Y))
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lam), lam_ref, rtol=1e-10, atol=1e-12)


def test_mcra_minima_reset_schedule():
    """The L-window reset must fire on the same frames as the reference: the
    shared `ell` counter resets to 1 after a reset frame."""
    mcra_mod = refutil.load("DistantSpeech.noise_estimation.mcra")
    nfft, T = 256, 64
    Y = _spectrum_fixture(T=T, nfft=nfft, seed=3)

    ref = mcra_mod.NoiseEstimationMCRA(nfft=nfft)
    smin_ref = np.zeros_like(Y)
    for t in range(T):
        ref.estimation(Y[t])
        smin_ref[t] = ref.Smin

    import jax
    from distantspeech_tpu.noise.mcra import mcra_init, mcra_step

    cfg = McraConfig(nfft=nfft)
    state = mcra_init(cfg, dtype=jnp.float64)
    for t in range(T):
        state, _ = mcra_step(cfg, state, jnp.asarray(Y[t]))
        np.testing.assert_allclose(np.asarray(state.Smin), smin_ref[t], rtol=1e-10, err_msg=f"frame {t}")


def test_mcra_batched():
    """Batch dimension broadcasts: each stream matches its solo run."""
    cfg = McraConfig(nfft=256)
    Y0 = _spectrum_fixture(seed=1)
    Y1 = _spectrum_fixture(seed=2)
    Yb = jnp.stack([jnp.asarray(Y0), jnp.asarray(Y1)], axis=1)  # [T, B, F]
    lam_b, p_b = mcra_run(cfg, Yb)
    lam0, p0 = mcra_run(cfg, jnp.asarray(Y0))
    lam1, p1 = mcra_run(cfg, jnp.asarray(Y1))
    np.testing.assert_allclose(np.asarray(lam_b[:, 0]), np.asarray(lam0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p_b[:, 1]), np.asarray(p1), rtol=1e-12)
