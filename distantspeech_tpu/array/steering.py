"""TDOA and steering vectors — vectorised over mics, bins, and look angles.

Replaces the reference's per-bin / per-mic Python loops
(MicArray.steering_vector MicArray.py:74-94, free compute_tau
MicArray.py:149-187, beamformer.compute_steering_vector_from_doa
beamformer.py:267-289) with single broadcasted expressions; usable both from
NumPy on the host and inside jit (everything is jnp-compatible).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from distantspeech_tpu.array.geometry import ArrayGeometry


def omega_bins(n_fft: int, fs: int, half_bin: int | None = None):
    """Angular frequency of each rfft bin: omega_k = 2 pi k fs / n_fft.

    Matches beamformer.py:247-248 (which evaluates fs/n_fft at k = 0..n_fft/2).
    Returns [half_bin] float64.
    """
    if half_bin is None:
        half_bin = n_fft // 2 + 1
    return 2.0 * np.pi * np.arange(half_bin) * (fs / n_fft)


def _unit_direction(incident_angle):
    """Unit vector pointing from the origin toward the source direction.

    incident_angle: [..., 2] (azimuth, elevation) in radians.
    Returns [..., 3].
    """
    incident_angle = np.asarray(incident_angle, dtype=np.float64)
    az = incident_angle[..., 0]
    el = incident_angle[..., 1]
    return np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)],
        axis=-1,
    )


def compute_tau(geometry: ArrayGeometry, incident_angle, normalize: bool = False):
    """Propagation delay of each mic relative to the array origin.

    Negative tau[m] means the wavefront reaches mic m *before* the origin.
    Closed form tau_m = -(r_m . u) / c for far-field direction u — identical
    (up to the reference's 1e-12 division guard) to the loop in
    MicArray.compute_tau (MicArray.py:96-146).

    Parameters
    ----------
    incident_angle : array [..., 2]
        (azimuth, elevation) in radians; any batch of look directions.
    normalize : bool
        If True, subtract tau of mic 0 (reference point = first mic).

    Returns
    -------
    tau : np.ndarray [..., M]
    """
    u = _unit_direction(incident_angle)  # [..., 3]
    tau = -(u @ geometry.mic_loc.T) / geometry.c  # [..., M]
    if normalize:
        tau = tau - tau[..., :1]
    return tau


def steering_vector(geometry: ArrayGeometry, incident_angle, n_fft: int, dtype=np.complex128):
    """Free-field (delay-only) steering vector for each rfft bin.

    a[..., k, m] = exp(-1j * omega_k * tau_m), the reference's
    compute_steering_vector_from_doa (beamformer.py:267-289) without the
    per-bin loop.

    Parameters
    ----------
    incident_angle : array [..., 2]
        (azimuth, elevation) in radians.

    Returns
    -------
    a : np.ndarray [..., half_bin, M]
    """
    tau = compute_tau(geometry, incident_angle)  # [..., M]
    omega = omega_bins(n_fft, geometry.fs)  # [K]
    phase = omega[..., :, None] * tau[..., None, :]  # [..., K, M]
    return np.exp(-1j * phase).astype(dtype)


def steering_vector_jax(tau, omega, dtype=jnp.complex64):
    """jit-friendly steering vector from precomputed tau [..., M] and omega [K]."""
    phase = omega[..., :, None] * tau[..., None, :]
    return jnp.exp(-1j * phase).astype(dtype)
