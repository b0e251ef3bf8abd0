"""Parity tests for the previously-untested beamformer weight formulas and
quality metrics vs the reference oracles:

- blind_analytic_normalization, get_gev_vector: beamformer.py:34-97
- compute_pmwf_weight: beamformer.py:100-131 (module fn) and
  mcspp_base.py:220-241 (method)
- compute_wng_di / compute_beampattern: beamformer.py:463-534
"""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.array import ArrayGeometry
from distantspeech_tpu.stats.metrics import beampattern, wng_di
from distantspeech_tpu.stats.weights import (
    blind_analytic_normalization,
    gev_weights,
    pca_steering,
    pmwf_weights,
)


@pytest.fixture(scope="module")
def ref_mods():
    refutil.patch_beamformer_base()
    return {
        "MicArray": refutil.load("DistantSpeech.beamformer.MicArray"),
        "beamformer": refutil.load("DistantSpeech.beamformer.beamformer"),
        "mcspp_base": refutil.load("DistantSpeech.noise_estimation.mcspp_base"),
    }


def _random_psd(rng, F, M, load=1.0):
    """Random well-conditioned hermitian PSD matrices [F, M, M]."""
    A = rng.standard_normal((F, M, M)) + 1j * rng.standard_normal((F, M, M))
    return A @ np.conj(np.swapaxes(A, -1, -2)) + load * np.eye(M)


def test_ban_parity(ref_mods):
    rng = np.random.default_rng(0)
    F, M = 129, 4
    w = (rng.standard_normal((F, M)) + 1j * rng.standard_normal((F, M))).astype(complex)
    Rvv = _random_psd(rng, F, M)

    want = ref_mods["beamformer"].blind_analytic_normalization(w, Rvv)
    got = np.asarray(blind_analytic_normalization(jnp.asarray(w), jnp.asarray(Rvv)))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_pca_steering_parity(ref_mods):
    """Covariance-whitened steering estimator vs reference ``steering``
    (beamformer.py:10-31) — eigenvectors are sign/phase-ambiguous, but both
    implementations pin the phase to channel 0, so they agree up to a real
    positive scale of 1 (eigh normalises)."""
    rng = np.random.default_rng(5)
    F, M = 129, 4
    Rxx = _random_psd(rng, F, M)

    want = ref_mods["beamformer"].steering(Rxx)
    got = np.asarray(pca_steering(jnp.asarray(Rxx)))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


def test_pca_steering_recovers_rank1_direction():
    """On a rank-1 coherent-source covariance the PCA steering equals the
    true propagation vector (up to the channel-0 phase convention) — the
    DOA-free MVDR companion use (examples/run_pca_mvdr.py)."""
    rng = np.random.default_rng(6)
    F, M = 65, 6
    a = np.exp(1j * rng.uniform(-np.pi, np.pi, (F, M)))
    Rxx = 4.0 * a[..., :, None] * np.conj(a[..., None, :]) + 1e-6 * np.eye(M)
    got = np.asarray(pca_steering(jnp.asarray(Rxx)))
    want = a / np.exp(1j * np.angle(a[..., :1]))
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pmwf_weight_parity(ref_mods):
    rng = np.random.default_rng(1)
    F, M = 129, 4
    xi = rng.uniform(0.01, 10.0, F)
    Rxx = _random_psd(rng, F, M)
    Rvv_inv = np.linalg.inv(_random_psd(rng, F, M))

    got = np.asarray(pmwf_weights(jnp.asarray(xi), jnp.asarray(Rxx), jnp.asarray(Rvv_inv), beta=1.0))

    # oracle: the McSppBase method (mcspp_base.py:220-241), the only variant
    # the reference actually calls (mcspp.py:286, mcspp_base.py:293); the
    # module-level compute_pmwf_weight (beamformer.py:100-131) has no callers
    # and derives the channel count from Rxx.shape[0], which only works for
    # a single broadcast [M, M] matrix.
    ref = ref_mods["mcspp_base"].McSppBase(nfft=256, channels=M)
    ref.compute_pmwf_weight(xi, Rxx, Rvv_inv, beta=1)
    np.testing.assert_allclose(got, ref.w, rtol=1e-8, atol=1e-10)

    # the module-level variant agrees on its own terms: one broadcast Rxx
    Rxx1 = _random_psd(rng, 1, M)[0]
    want1 = ref_mods["beamformer"].compute_pmwf_weight(xi, Rxx1, Rvv_inv, beta=1)
    got1 = np.asarray(
        pmwf_weights(jnp.asarray(xi), jnp.asarray(np.broadcast_to(Rxx1, Rxx.shape)), jnp.asarray(Rvv_inv), beta=1.0)
    )
    np.testing.assert_allclose(got1, want1, rtol=1e-8, atol=1e-10)


def test_gev_weight_parity(ref_mods):
    """GEV principal generalised eigenvector.  Eigenvectors are defined up
    to a unit phase per bin, so parity is asserted after phase alignment;
    both sides share scipy's v^H Rvv v = 1 normalisation."""
    rng = np.random.default_rng(2)
    F, M = 65, 4
    Rxx = _random_psd(rng, F, M)
    Rvv = _random_psd(rng, F, M)

    want = ref_mods["beamformer"].get_gev_vector(Rxx, Rvv)
    got = np.asarray(gev_weights(jnp.asarray(Rxx), jnp.asarray(Rvv)))

    # same normalisation as scipy.linalg.eigh(a, b): w^H Rvv w == 1
    n = np.einsum("fa,fab,fb->f", got.conj(), Rvv, got)
    np.testing.assert_allclose(n.real, 1.0, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(n.imag, 0.0, atol=1e-9)

    phase = np.exp(1j * np.angle(np.einsum("fm,fm->f", got.conj(), want)))
    np.testing.assert_allclose(got * phase[:, None], want, rtol=1e-6, atol=1e-8)


def test_wng_di_parity(ref_mods):
    M, r = 4, 0.032
    mic = ref_mods["MicArray"].MicArray(arrayType="circular", r=r, M=M)
    ref_bf = ref_mods["beamformer"].beamformer(mic, 256, 128, 256)
    geom = ArrayGeometry.circular(M, r)
    look = (60.0, 0.0)

    W = ref_bf.compute_weights(look_angle=list(look), weightType="SD", diag_value=1e-3)
    wng_ref, di_ref = ref_bf.compute_wng_di(weights=W, look_angle=list(look))

    # the reference's compute_array_gain broadcasts a [F, 1] numerator
    # against a [F, 1, 1] denominator, so with bin-wise Rvv it returns a
    # redundant [F, F] matrix whose diagonal is the per-bin gain
    wng_ref, di_ref = np.diag(np.atleast_2d(wng_ref)), np.diag(np.atleast_2d(di_ref))

    wng_ours, di_ours = wng_di(geom, jnp.asarray(W), look, 256)
    np.testing.assert_allclose(np.asarray(wng_ours), wng_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(di_ours), di_ref, rtol=1e-6, atol=1e-8)


def test_beampattern_parity(ref_mods):
    M, r = 4, 0.032
    mic = ref_mods["MicArray"].MicArray(arrayType="circular", r=r, M=M)
    ref_bf = ref_mods["beamformer"].beamformer(mic, 256, 128, 256)
    geom = ArrayGeometry.circular(M, r)

    W = ref_bf.compute_weights(look_angle=[30, 0], weightType="DS")  # [F, M]
    want = ref_bf.compute_beampattern(mic, weights=W.T)  # reference takes [M, F]
    got = np.asarray(beampattern(geom, jnp.asarray(W), 256))  # [360, F]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
