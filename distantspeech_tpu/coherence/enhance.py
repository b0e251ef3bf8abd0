"""Dual-mic coherence-based enhancement (binaural noise reduction).

Oracle: BinauralEnhancement.getweights/process
(/root/reference/DistantSpeech/coherence/BinauralEnhancement.py:62-108):
per frame, recursive pair PSD/CSDs (alpha = 0.6), estimated complex
coherence of the (0,1) pair, one of the five published gain rules
(``coherence.weights.coherent_gain``), multiplicative gain, streaming ISTFT.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from distantspeech_tpu.array.coherence import diffuse_coherence
from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.coherence.msc import MscState, msc_init, msc_update, pair_index
from distantspeech_tpu.coherence.weights import coherent_gain
from distantspeech_tpu.transform import StftConfig, analysis, synthesis


@dataclasses.dataclass(frozen=True)
class BinauralConfig:
    n_fft: int = 256
    method: int = 3
    alpha: float = 0.6  # getweights recursion (BinauralEnhancement.py:71)
    radius: float = 0.032

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.n_fft // 2)

    @property
    def half_bin(self) -> int:
        return self.n_fft // 2 + 1


def binaural_step(
    cfg: BinauralConfig, Fn: jnp.ndarray, state: MscState, Z: jnp.ndarray
) -> Tuple[MscState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One frame.  Fn: [F] diffuse coherence of pair (0,1); Z: [..., F, 2].

    Returns (state, (Y [..., F] enhanced spectrum, snr [..., F]))."""
    state, Fvv_est = msc_update(state, Z, cfg.alpha)
    Fx = Fvv_est[..., pair_index(2, 0, 1)]
    G, snr = coherent_gain(Fx, Fn, method=cfg.method, r=cfg.radius)
    return state, (G.astype(Z.dtype) * Z[..., 0], snr)


def binaural_process(
    x: jnp.ndarray, geometry: ArrayGeometry, cfg: BinauralConfig = BinauralConfig()
):
    """Offline dual-mic enhancement.  x: [..., 2, S] -> ([..., S], snr [..., T, F])."""
    Fn = jnp.asarray(diffuse_coherence(geometry, cfg.n_fft)[:, 0, 1], dtype=x.dtype)
    X = analysis(x, cfg.stft)  # [..., 2, T, F]
    Zt = jnp.moveaxis(jnp.moveaxis(X, -3, -1), -3, 0)  # [T, ..., F, 2]
    state = msc_init(2, cfg.half_bin, batch_shape=Zt.shape[1:-2], cdtype=Zt.dtype)
    _, (Y, snr) = jax.lax.scan(lambda s, z: binaural_step(cfg, Fn, s, z), state, Zt)
    y = synthesis(jnp.moveaxis(Y, 0, -2), cfg.stft)
    return y, jnp.moveaxis(snr, 0, -2)
