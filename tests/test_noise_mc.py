"""Parity tests for the multichannel noise / SPP estimators vs. the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.noise import (
    Mcra2Config,
    McMcraConfig,
    McSppBaseConfig,
    McSppConfig,
    OmlsaConfig,
    mc_mcra_run,
    mcra2_run,
    mcspp_base_run,
    mcspp_run,
    omlsa_run,
)


def _spectrum_fixture(T=160, nfft=256, seed=0):
    rng = np.random.default_rng(seed)
    F = nfft // 2 + 1
    noise = rng.rayleigh(1.0, size=(T, F)) ** 2
    burst = np.zeros((T, F))
    t0, t1 = int(T * 0.4), int(T * 0.7)
    burst[t0:t1, 10:60] = 40.0 * rng.rayleigh(1.0, size=(t1 - t0, 50)) ** 2
    return noise + burst


def _complex_fixture(T=120, nfft=256, C=4, seed=0):
    """Multichannel complex spectra with a correlated 'speech' burst."""
    rng = np.random.default_rng(seed)
    F = nfft // 2 + 1
    y = (rng.standard_normal((T, F, C)) + 1j * rng.standard_normal((T, F, C))) / np.sqrt(2)
    src = (rng.standard_normal((T, F, 1)) + 1j * rng.standard_normal((T, F, 1))) / np.sqrt(2)
    t0, t1 = int(T * 0.3), int(T * 0.8)
    y[t0:t1] += 6.0 * src[t0:t1]  # coherent across channels
    return y


@pytest.mark.parametrize("nfft", [256, 320])
def test_mcra2_parity(nfft):
    mod = refutil.load("DistantSpeech.noise_estimation.mcra2")
    T = 160
    Y = _spectrum_fixture(T=T, nfft=nfft)

    ref = mod.MCRA2(nfft=nfft)
    lam_ref = np.zeros_like(Y)
    p_ref = np.zeros_like(Y)
    for t in range(T):
        ref.estimation(Y[t])
        lam_ref[t] = ref.lambda_d
        p_ref[t] = ref.p

    lam, p = mcra2_run(Mcra2Config(nfft=nfft), jnp.asarray(Y))
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lam), lam_ref, rtol=1e-10, atol=1e-12)


def test_omlsa_multi_parity():
    mod = refutil.load("DistantSpeech.noise_estimation.omlsa_multi")
    nfft, M, T = 256, 4, 160
    Y = _spectrum_fixture(T=T, nfft=nfft, seed=5)  # beam power
    U = np.stack([_spectrum_fixture(T=T, nfft=nfft, seed=6 + ch) for ch in range(M - 1)], axis=1)

    ref = mod.NsOmlsaMulti(nfft=nfft, M=M, cal_weights=True)
    lam_ref = np.zeros((T, nfft // 2 + 1))
    p_ref = np.zeros_like(lam_ref)
    G_ref = np.zeros_like(lam_ref)
    for t in range(T):
        ref.estimation(Y[t], U[t].T)  # reference wants [half_bin, M-1]
        lam_ref[t] = ref.lambda_d
        p_ref[t] = ref.p
        G_ref[t] = ref.G

    lam, p, G = omlsa_run(OmlsaConfig(nfft=nfft, n_channels=M), jnp.asarray(Y), jnp.asarray(U))
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lam), lam_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(G), G_ref, rtol=1e-9, atol=1e-10)


def test_mcspp_base_parity():
    mod = refutil.load("DistantSpeech.noise_estimation.mcspp_base")
    nfft, C, T = 256, 4, 120
    y = _complex_fixture(T=T, nfft=nfft, C=C)

    ref = mod.McSppBase(nfft=nfft, channels=C)
    p_ref = np.zeros((T, nfft // 2 + 1))
    q_ref = np.zeros_like(p_ref)
    xi_ref = np.zeros_like(p_ref)
    w_ref = np.zeros((T, nfft // 2 + 1, C), dtype=complex)
    for t in range(T):
        ref.estimation(y[t])
        p_ref[t] = ref.p
        q_ref[t] = ref.q
        xi_ref[t] = ref.xi
        w_ref[t] = ref.w

    out = mcspp_base_run(McSppBaseConfig(nfft=nfft, n_channels=C), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out.q), q_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.xi), xi_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.p), p_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.w), w_ref, rtol=1e-7, atol=1e-9)


def test_mc_mcra_parity():
    mod = refutil.load("DistantSpeech.noise_estimation.mc_mcra")
    nfft, C, T = 256, 4, 100
    y = _complex_fixture(T=T, nfft=nfft, C=C, seed=2)

    ref = mod.McMcra(nfft=nfft, channels=C)
    p_ref = np.zeros((T, nfft // 2 + 1))
    q_ref = np.zeros_like(p_ref)
    G_ref = np.zeros_like(p_ref)
    for t in range(T):
        ref.estimation(y[t])
        p_ref[t] = ref.p
        q_ref[t] = ref.q
        G_ref[t] = ref.G

    out = mc_mcra_run(McMcraConfig(nfft=nfft, n_channels=C), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out.q), q_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.p), p_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.G), G_ref, rtol=1e-8, atol=1e-10)


def test_mcspp_full_parity():
    mcspp_mod = refutil.load("DistantSpeech.noise_estimation.mcspp")
    nfft, C, T = 256, 4, 100
    y = _complex_fixture(T=T, nfft=nfft, C=C, seed=3)

    ref = mcspp_mod.McSpp(nfft=nfft, channels=C)
    p_ref = np.zeros((T, nfft // 2 + 1))
    q_ref = np.zeros_like(p_ref)
    w_ref = np.zeros((T, nfft // 2 + 1, C), dtype=complex)
    for t in range(T):
        ref.estimation(y[t])
        p_ref[t] = ref.p
        q_ref[t] = ref.q
        w_ref[t] = ref.w

    out = mcspp_run(McSppConfig(nfft=nfft, n_channels=C), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out.q), q_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.p), p_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.w), w_ref, rtol=1e-6, atol=1e-8)
