"""Shoebox room simulation: image-source RIRs + SNR/SIR scene mixing.

Capability parity with ArraySim
(/root/reference/DistantSpeech/beamformer/ArraySim.py:166-436), which wraps
pyroomacoustics (not available in this image) — so the physics here is a
self-contained vectorised Allen-Berkley image-source model: all images up
to ``max_order`` are generated in one tensor expression, band-limited
fractional delays via windowed sinc, 1/(4 pi d) spreading, per-surface
reflection coefficients.  The SNR/SIR mixing follows callback_mix
(ArraySim.py:140-163).  Host-side NumPy: fixture generation, not a hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class RoomConfig:
    size: Tuple[float, float, float] = (5.0, 3.0, 3.0)
    fs: int = 16000
    c: float = 343.0
    max_order: int = 3
    energy_absorption: float = 0.7
    rir_length: Optional[int] = None  # samples; default covers the longest image path

    @property
    def reflection(self) -> float:
        """Amplitude reflection coefficient from the energy absorption."""
        return float(np.sqrt(1.0 - self.energy_absorption))


def image_source_rir(
    src: np.ndarray, mics: np.ndarray, cfg: RoomConfig = RoomConfig(), sinc_width: int = 81
) -> np.ndarray:
    """RIRs from one source to each mic.  src: [3]; mics: [M, 3] -> [M, L].

    Vectorised Allen-Berkley: image positions over (order, parity) pairs per
    axis, amplitude beta^(#reflections) / (4 pi d), band-limited impulses.
    """
    src = np.asarray(src, dtype=np.float64)
    mics = np.asarray(mics, dtype=np.float64)
    Lx, Ly, Lz = cfg.size
    N = cfg.max_order

    n = np.arange(-N, N + 1)
    # per-axis image coordinates and reflection counts for both parities
    def axis_images(x_s, L_ax):
        pos = np.concatenate([2.0 * n * L_ax + x_s, 2.0 * n * L_ax - x_s])
        refl = np.concatenate([2 * np.abs(n), np.abs(2 * n - 1)])
        return pos, refl

    px, rx = axis_images(src[0], Lx)
    py, ry = axis_images(src[1], Ly)
    pz, rz = axis_images(src[2], Lz)

    # total order filter: |nx|+|ny|+|nz| reflections <= ... keep all whose
    # reflection count per axis stems from order <= N images (standard ISM)
    P = np.stack(np.meshgrid(px, py, pz, indexing="ij"), axis=-1).reshape(-1, 3)
    R = (rx[:, None, None] + ry[None, :, None] + rz[None, None, :]).reshape(-1)
    keep = R <= cfg.max_order
    P, R = P[keep], R[keep]

    d = np.linalg.norm(P[None, :, :] - mics[:, None, :], axis=-1)  # [M, I]
    amp = (cfg.reflection**R)[None, :] / (4.0 * np.pi * np.maximum(d, 1e-2))
    delay = d / cfg.c * cfg.fs  # fractional samples

    L = cfg.rir_length or int(np.ceil(delay.max())) + sinc_width + 1
    t = np.arange(L)
    # band-limited impulse: windowed sinc centred at the fractional delay
    half = sinc_width // 2
    di = np.floor(delay).astype(int)
    rir = np.zeros((mics.shape[0], L))
    win_t = np.arange(sinc_width) - half
    hann = np.hanning(sinc_width)
    for m in range(mics.shape[0]):
        idx = di[m][:, None] + win_t[None, :]  # [I, W]
        frac = (delay[m] - di[m])[:, None]
        taps = amp[m][:, None] * hann * np.sinc(win_t[None, :] - frac)
        valid = (idx >= 0) & (idx < L)
        np.add.at(rir[m], idx[valid], taps[valid])
    return rir


def simulate_propagation(
    signal: np.ndarray, src: np.ndarray, mics: np.ndarray, cfg: RoomConfig = RoomConfig()
) -> np.ndarray:
    """Convolve a dry source with its RIRs: [S] -> [M, S]."""
    rir = image_source_rir(src, mics, cfg)
    S = len(signal)
    out = np.stack([np.convolve(signal, rir[m])[:S] for m in range(rir.shape[0])], axis=0)
    return out


def generate_scene(
    source_signal: np.ndarray,
    mics: np.ndarray,
    interference: Optional[np.ndarray] = None,
    source_angle: float = 90.0,
    source_distance: float = 1.0,
    interf_angle: float = 30.0,
    interf_distance: float = 1.5,
    snr: float = 30.0,
    sir: float = 15.0,
    cfg: RoomConfig = RoomConfig(),
    seed: int = 0,
) -> np.ndarray:
    """Reverberant multichannel mixture at chosen SNR/SIR (ArraySim.generate_audio).

    mics: [M, 3] array coordinates centred on the origin; the array is
    placed at the room centre like the reference (ArraySim.py:186-190).
    Returns mix [M, S].
    """
    rng = np.random.default_rng(seed)
    center = np.array([cfg.size[0] / 2.0, cfg.size[1] / 2.0, 0.5])
    mics_room = mics + center

    def place(angle_deg, dist):
        a = angle_deg / 180.0 * np.pi
        return center + np.array([np.cos(a) * dist, np.sin(a) * dist, 0.0])

    premix = [simulate_propagation(source_signal, place(source_angle, source_distance), mics_room, cfg)]
    if interference is None:
        interference = rng.random(len(source_signal)) / 10.0  # ArraySim.py:255-257
    premix.append(simulate_propagation(interference[: len(source_signal)], place(interf_angle, interf_distance), mics_room, cfg))
    premix = np.stack(premix, axis=0)  # [2, M, S]

    # callback_mix semantics (ArraySim.py:140-163)
    p_ref = np.std(premix[:, 0, :], axis=1)
    premix = premix / p_ref[:, None, None]
    premix[1:] *= np.sqrt(10 ** (-sir / 10.0))
    max_value = np.max(np.abs(premix))
    sigma_n = np.sqrt(10 ** (-snr / 10.0))
    mix = premix.sum(axis=0) + sigma_n * rng.standard_normal(premix.shape[1:])
    return mix / max_value
