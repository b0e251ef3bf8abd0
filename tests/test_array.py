"""Parity tests for array geometry / steering / coherence vs. the reference."""

import numpy as np
import pytest

import refutil
from distantspeech_tpu.array import (
    ArrayGeometry,
    compute_tau,
    diffuse_coherence,
    steering_vector,
)


@pytest.fixture(scope="module")
def ref_micarray():
    return refutil.load("DistantSpeech.beamformer.MicArray")


def _ref_array(ref_micarray, array_type, M, r):
    return ref_micarray.MicArray(arrayType=array_type, r=r, M=M)


@pytest.mark.parametrize("array_type,M,r", [("linear", 4, 0.032), ("circular", 4, 0.032), ("circular", 8, 0.05)])
def test_mic_locations_match_reference(ref_micarray, array_type, M, r):
    ref = _ref_array(ref_micarray, array_type, M, r)
    geom = ArrayGeometry.linear(M, r) if array_type == "linear" else ArrayGeometry.circular(M, r)
    np.testing.assert_allclose(geom.mic_loc, ref.mic_loc, atol=1e-12)


@pytest.mark.parametrize("array_type,M", [("linear", 4), ("circular", 4), ("circular", 8)])
@pytest.mark.parametrize("angle_deg", [(0, 0), (30, 0), (90, 0), (197, 0), (245, 30)])
def test_compute_tau_parity(ref_micarray, array_type, M, angle_deg):
    r = 0.032
    ref = _ref_array(ref_micarray, array_type, M, r)
    geom = ArrayGeometry.linear(M, r) if array_type == "linear" else ArrayGeometry.circular(M, r)

    angle_rad = np.array(angle_deg) / 180 * np.pi
    tau_ref = ref.compute_tau(angle_rad).copy()  # class method, [M, 1]
    tau_free = ref_micarray.compute_tau(ref, angle_rad)  # free function, [M, 1]
    tau_ours = compute_tau(geom, angle_rad)

    np.testing.assert_allclose(tau_ours, tau_ref[:, 0], atol=1e-9)
    np.testing.assert_allclose(tau_ours, tau_free[:, 0], atol=1e-9)


def test_compute_tau_batched_angles():
    geom = ArrayGeometry.circular(6, 0.04)
    angles = np.stack([np.linspace(0, 2 * np.pi, 13), np.zeros(13)], axis=-1)
    tau = compute_tau(geom, angles)
    assert tau.shape == (13, 6)
    for i, a in enumerate(angles):
        np.testing.assert_allclose(tau[i], compute_tau(geom, a), atol=1e-12)


def test_compute_tau_normalize():
    geom = ArrayGeometry.linear(4, 0.032)
    tau = compute_tau(geom, np.array([0.5, 0.1]), normalize=True)
    assert tau[0] == 0.0


@pytest.mark.parametrize("look_deg", [0, 45, 197])
def test_steering_vector_parity(ref_micarray, look_deg):
    M, r = 4, 0.032
    ref = _ref_array(ref_micarray, "circular", M, r)
    geom = ArrayGeometry.circular(M, r)

    a_ref = ref.steering_vector(look_direction=look_deg)  # [half_bin, M]
    a_ours = steering_vector(geom, np.array([look_deg, 0]) / 180 * np.pi, n_fft=256)
    np.testing.assert_allclose(a_ours, a_ref, atol=1e-9)


@pytest.mark.parametrize("array_type,M,nfft", [("linear", 4, 256), ("circular", 8, 256), ("circular", 4, 512)])
def test_diffuse_coherence_parity(ref_micarray, array_type, M, nfft):
    gen = refutil.load("DistantSpeech.beamformer.gen_noise_msc")
    r = 0.032
    ref = _ref_array(ref_micarray, array_type, M, r)
    geom = ArrayGeometry.linear(M, r) if array_type == "linear" else ArrayGeometry.circular(M, r)

    fvv_ref = gen.gen_noise_msc(ref, nfft=nfft)
    fvv_ours = diffuse_coherence(geom, n_fft=nfft)
    assert fvv_ours.shape == fvv_ref.shape
    np.testing.assert_allclose(fvv_ours, fvv_ref, atol=1e-10)
