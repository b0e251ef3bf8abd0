"""Spatial coherence models for idealised noise fields.

Vectorised replacement of the reference's per-pair loop gen_noise_msc
(/root/reference/DistantSpeech/beamformer/gen_noise_msc.py:7-28).
"""

from __future__ import annotations

import numpy as np

from distantspeech_tpu.array.geometry import ArrayGeometry


def diffuse_coherence(geometry: ArrayGeometry, n_fft: int = 256, coh_max: float = 0.9998) -> np.ndarray:
    """Spherically-isotropic (diffuse) noise-field coherence Gamma(f).

    Gamma[k, i, j] = sinc(2 pi f_k d_ij / c)  (unnormalised sinc), with the
    diagonal clamped to ``coh_max`` exactly as the reference does
    (gen_noise_msc.py:23-26, including its f[0] = 1e-6 DC guard).

    Returns [half_bin, M, M] float64.
    """
    half_bin = round(n_fft / 2 + 1)
    f = np.linspace(0.0, geometry.fs / 2.0, half_bin)
    f[0] = 1e-6
    diff = geometry.mic_loc[:, None, :] - geometry.mic_loc[None, :, :]
    d = np.sqrt(np.sum(diff**2, axis=-1))  # [M, M]
    x = 2.0 * np.pi * f[:, None, None] * d[None] / geometry.c
    with np.errstate(divide="ignore", invalid="ignore"):
        coh = np.sin(x) / x
    eye = np.broadcast_to(np.eye(geometry.n_mics, dtype=bool), coh.shape)
    coh = np.where(eye, coh_max, coh)
    return coh
