"""Oversampled Nyquist(M) subband analysis / synthesis filterbank.

Oracle: Subband (/root/reference/DistantSpeech/transform/subband.py:18-166).
Analysis is a polyphase decimated filterbank: each frame of ``win_len =
m * n_fft`` samples is time-reversed, windowed by the analysis prototype h,
folded into ``n_fft`` samples (sum of m segments) and rfft'd — here one
batched gather + reshape + rfft over all frames/channels at once instead of
the reference's per-channel per-frame loop (subband.py:117-121).

Synthesis is recursive across frames by construction (a time-delay line the
length of the synthesis prototype, subband.py:139-152), so it is a
``lax.scan`` whose carry is the tdl vector; the per-frame body is irfft +
tile + axpy.

Scaling quirk kept: synthesis multiplies by ``n_fft * hop`` then divides the
final signal by ``hop`` (subband.py:150-154) — net gain n_fft — and the
streaming carries live in the same places as the reference
(previous_input [overlap], tdl [win_len]).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from distantspeech_tpu.ops.dft import irdft, rdft
import numpy as np

from distantspeech_tpu.ops.framing import frame_signal
from distantspeech_tpu.transform.filterbank_design import nyquist_prototypes


@dataclasses.dataclass(frozen=True)
class SubbandConfig:
    """Static filterbank parameters (hashable; prototypes designed lazily)."""

    n_fft: int = 256
    hop: int = 128
    m: int = 2  # prototype length factor

    @property
    def half_bin(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def r(self) -> int:
        # decimation exponent the reference derives from hop (subband.py:26)
        return int(self.n_fft / self.hop / 2)

    @property
    def win_len(self) -> int:
        return self.n_fft * self.m

    @property
    def overlap(self) -> int:
        return self.win_len - self.hop

    def prototypes(self) -> Tuple[np.ndarray, np.ndarray]:
        return nyquist_prototypes(self.n_fft, self.m, self.r)


def subband_analysis_frames(x: jnp.ndarray, cfg: SubbandConfig, h: jnp.ndarray) -> jnp.ndarray:
    """Analysis of a padded signal with no implicit carry.

    x: [..., samples] -> Y: [..., T, half_bin] with
    T = (samples - overlap) // hop.
    """
    frames = frame_signal(x, cfg.win_len, cfg.hop)  # [..., T, win]
    windowed = jnp.flip(frames, axis=-1) * h
    folded = windowed.reshape(*windowed.shape[:-1], cfg.m, cfg.n_fft).sum(axis=-2)
    return rdft(folded, axis=-1)


def subband_analysis(x: jnp.ndarray, cfg: SubbandConfig) -> jnp.ndarray:
    """Offline analysis from the zero ``previous_input`` state.

    x: [..., hop * T] -> [..., T, half_bin].
    """
    h = jnp.asarray(cfg.prototypes()[0], dtype=x.dtype)
    pad = [(0, 0)] * (x.ndim - 1) + [(cfg.overlap, 0)]
    return subband_analysis_frames(jnp.pad(x, pad), cfg, h)


def subband_analysis_stream(
    carry: jnp.ndarray, chunk: jnp.ndarray, cfg: SubbandConfig, h: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming analysis step; carry: [..., overlap] input tail."""
    x = jnp.concatenate([carry, chunk], axis=-1)
    return x[..., -cfg.overlap :], subband_analysis_frames(x, cfg, h)


def subband_synthesis_step(
    tdl: jnp.ndarray, Y_frame: jnp.ndarray, cfg: SubbandConfig, g: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One frame of polyphase synthesis.

    tdl: [..., win_len] delay-line carry; Y_frame: [..., half_bin].
    Returns (tdl', y [..., hop]) with the reference's net n_fft scaling.
    """
    y = irdft(Y_frame, n=cfg.n_fft, axis=-1)
    y_win = jnp.tile(y, (1,) * (y.ndim - 1) + (cfg.m,)) * g
    shifted = jnp.concatenate([jnp.zeros_like(tdl[..., : cfg.hop]), tdl[..., : -cfg.hop]], axis=-1)
    tdl = shifted + y_win
    out = cfg.n_fft * jnp.flip(tdl[..., -cfg.hop :], axis=-1)
    return tdl, out


def subband_synthesis(Y: jnp.ndarray, cfg: SubbandConfig) -> jnp.ndarray:
    """Offline synthesis from the zero tdl state.

    Y: [..., T, half_bin] -> [..., hop * T].
    """
    rdtype = Y.real.dtype
    g = jnp.asarray(cfg.prototypes()[1], dtype=rdtype)
    tdl = jnp.zeros((*Y.shape[:-2], cfg.win_len), dtype=rdtype)
    Yt = jnp.moveaxis(Y, -2, 0)
    _, out = jax.lax.scan(lambda c, yf: subband_synthesis_step(c, yf, cfg, g), tdl, Yt)
    out = jnp.moveaxis(out, 0, -2)  # [..., T, hop]
    return out.reshape(*out.shape[:-2], -1)


def subband_synthesis_init(batch_shape, cfg: SubbandConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros((*batch_shape, cfg.win_len), dtype=dtype)
