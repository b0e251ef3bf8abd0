"""Parity tests for SRP-PHAT, IDOA, McCowan postfilter, binaural enhancement."""

import numpy as np
import jax.numpy as jnp

import refutil
from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.coherence.enhance import BinauralConfig, binaural_process
from distantspeech_tpu.coherence.msc import msc_init, pair_indices
from distantspeech_tpu.doa import IdoaConfig, SrpConfig, idoa_run
from distantspeech_tpu.doa.srp import srp_process
from distantspeech_tpu.postfilter import McCowanConfig, mccowan_gain


def _mic_array(M=4, r=0.032, n_fft=256):
    refutil.patch_beamformer_base()
    ma_mod = refutil.load("DistantSpeech.beamformer.MicArray")
    return ma_mod.MicArray(arrayType="circular", r=r, M=M, n_fft=n_fft)


def _cplx(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_srp_parity():
    mic = _mic_array()
    srp_mod = refutil.load("DistantSpeech.doa.srp")
    ref = srp_mod.srp(mic)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128 * 10, 4))
    spec_ref, p_ref = ref.compute_angle_spectrum(x, resolution=30)

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    cfg = SrpConfig(n_fft=256, resolution=30)
    spec, p = srp_process(jnp.asarray(x.T), geom, cfg)
    np.testing.assert_allclose(np.asarray(p).T, p_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(spec).T, spec_ref[::30], rtol=1e-6, atol=1e-8)


def test_idoa_parity():
    mic = _mic_array()
    idoa_mod = refutil.load("DistantSpeech.doa.idoa")
    ref = idoa_mod.Idoa(mic)
    T = 12
    X = _cplx((129, T, 4), 1)
    p_ref = ref.estimate(X.copy())  # [F, T, Theta]

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    cfg = IdoaConfig(n_fft=256, n_theta=360)
    X_tf = np.moveaxis(X, 1, 0)  # [T, F, M]
    p = np.asarray(idoa_run(cfg, geom, jnp.asarray(X_tf)))
    np.testing.assert_allclose(np.moveaxis(p, 0, 1), p_ref, rtol=1e-7, atol=1e-9)


def test_mccowan_gain_parity():
    mic = _mic_array()
    pf_mod = refutil.load("DistantSpeech.postfilter.postfilter")
    ref = pf_mod.PostFilter(mic, frameLen=256)
    T = 20
    Z = _cplx((T, 4, 129), 2)  # reference wants [M, F] per frame

    W_ref = np.zeros((T, 129))
    for t in range(T):
        W_ref[t] = ref.getweights(Z[t])

    geom = ArrayGeometry.circular(4, 0.032, c=343.0)
    cfg = McCowanConfig(n_fft=256, n_mics=4)
    from distantspeech_tpu.array.coherence import diffuse_coherence

    i_idx, j_idx = pair_indices(4)
    fvv_pairs = jnp.asarray(diffuse_coherence(geom, 256)[:, i_idx, j_idx])
    state = msc_init(4, 129, cdtype=jnp.complex128)
    for t in range(T):
        state, W = mccowan_gain(cfg, fvv_pairs, state, jnp.asarray(Z[t].T))
        np.testing.assert_allclose(np.asarray(W), W_ref[t], rtol=1e-8, atol=1e-10, err_msg=f"frame {t}")


def test_binaural_parity():
    mic = _mic_array(M=2)
    be_mod = refutil.load("DistantSpeech.coherence.BinauralEnhancement")
    ref = be_mod.BinauralEnhancement(mic, frameLen=256)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((128 * 12, 2))
    out_ref, snr_ref = ref.process(x)

    geom = ArrayGeometry.circular(2, 0.032, c=343.0)
    y, snr = binaural_process(jnp.asarray(x.T), geom, BinauralConfig(n_fft=256, method=3))
    n = min(len(np.asarray(y)), out_ref.shape[0])
    np.testing.assert_allclose(np.asarray(snr).T, snr_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(y)[:n], out_ref[:n, 0], rtol=1e-5, atol=1e-7)
