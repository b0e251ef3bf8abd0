"""Fractional-delay time alignment (the GSC fixed-beamformer steering).

Oracles: fractional_delay_filter_bank
(/root/reference/DistantSpeech/transform/multirate.py:4-51) and TimeAlignment
(/root/reference/DistantSpeech/beamformer/fixedbeamformer.py:51-95).
Filter design is host-side NumPy (one-time); application is the grouped-conv
streaming FIR in ``ops.fir``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.array.steering import compute_tau


def fractional_delay_filter_bank(delays: np.ndarray) -> np.ndarray:
    """Windowed-sinc fractional-delay bank (multirate.py:4-51).

    delays: [C] in (fractional) samples.  Returns [filter_len, C] with
    filter_len = 81 + ceil(max(delays - min(delays))).
    """
    delays = np.array(delays, dtype=np.float64)
    delays -= delays.min()
    N = delays.shape[0]
    L = 81
    filter_length = L + int(np.ceil(delays).max())
    bank_flat = np.zeros(N * filter_length)
    di = np.floor(delays).astype(np.int64)
    df = delays - di
    T = np.arange(L)
    indices = T[None, :] + (di[:, None] + filter_length * np.arange(N)[:, None])
    sinc_times = T - df[:, None] - (L - 1) / 2
    windows = np.tile(np.hanning(L), N)
    bank_flat[indices.ravel()] = windows * np.sinc(sinc_times.ravel())
    return np.reshape(bank_flat, (N, -1)).T


def time_alignment_filters(geometry: ArrayGeometry, angle_rad) -> np.ndarray:
    """Design the per-mic alignment FIR bank for a look direction.

    Matches TimeAlignment.__init__ (fixedbeamformer.py:62-75): delays are
    ``-(tau - max(tau)) * fs`` so every channel is delayed to the latest
    arrival.  Returns coeffs [C, K] (channel-major for ``ops.fir``).
    """
    tau = compute_tau(geometry, np.asarray(angle_rad, dtype=np.float64))
    tau = -(tau - np.max(tau))
    delay_samples = tau * geometry.fs
    bank = fractional_delay_filter_bank(delay_samples)  # [K, C]
    return bank.T
