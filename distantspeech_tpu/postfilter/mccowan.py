"""McCowan/Zelinski coherence-model postfilter.

Oracle: PostFilter.getweights (/root/reference/DistantSpeech/postfilter/
postfilter.py:45-85): recursive auto/cross PSDs over mic pairs, a
diffuse-coherence-corrected source PSD estimate (McCowan eq.22 with the
coherence clipped at 0.7), pair averaging (eq.23) and the Wiener gain
W = Pss / Pssnn applied to the delay-and-sum output.

The reference's ``process`` OLA driver is bit-rotted (it references
attributes its base class no longer defines, postfilter.py:92-100), so the
offline driver here applies the gain through this framework's standard
streaming STFT round-trip; the gain path itself is parity-tested.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from distantspeech_tpu.array.coherence import diffuse_coherence
from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.coherence.msc import MscState, msc_init, msc_update, pair_indices
from distantspeech_tpu.transform import StftConfig, analysis, synthesis


@dataclasses.dataclass(frozen=True)
class McCowanConfig:
    n_fft: int = 256
    n_mics: int = 4
    alpha: float = 0.8  # PSD recursion (postfilter.py:54)
    coh_max: float = 0.7  # eq.22 coherence clip (postfilter.py:67)

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.n_fft, self.n_fft // 2)

    @property
    def half_bin(self) -> int:
        return self.n_fft // 2 + 1


def mccowan_gain(
    cfg: McCowanConfig, fvv_pairs: jnp.ndarray, state: MscState, Z: jnp.ndarray
) -> Tuple[MscState, jnp.ndarray]:
    """One frame of the postfilter gain.

    fvv_pairs: [F, P] diffuse coherence of each (i<j) pair;
    Z: [..., F, M] multichannel spectra.  Returns (state, W [..., F]).
    """
    M = Z.shape[-1]
    i_idx, j_idx = pair_indices(M)
    state, _ = msc_update(state, Z, cfg.alpha)
    Pxii, Pxij = state.Pxii, state.Pxij  # [..., F, M], [..., F, P]

    Fvv = jnp.minimum(fvv_pairs, cfg.coh_max)
    # eq.22 per-pair source PSD estimate
    Pss_e = (jnp.real(Pxij) - 0.5 * Fvv * (Pxii[..., i_idx] + Pxii[..., j_idx])) / (1.0 - Fvv)
    N = M
    Pss = jnp.sum(Pss_e, axis=-1) * 2.0 / (N * N - N)  # eq.23 average
    Pssnn = jnp.sum(Pxii, axis=-1) / M
    return state, Pss / Pssnn


def mccowan_process(
    x: jnp.ndarray, ds: jnp.ndarray, geometry: ArrayGeometry, cfg: McCowanConfig = McCowanConfig()
) -> jnp.ndarray:
    """Offline postfiltering of a beamformed signal.

    x: [..., M, S] (time-aligned) mics; ds: [..., S] beamformed signal.
    Returns [..., S] postfiltered output (streaming STFT round-trip).
    """
    i_idx, j_idx = pair_indices(geometry.n_mics)
    fvv = diffuse_coherence(geometry, cfg.n_fft)  # [F, M, M]
    fvv_pairs = jnp.asarray(fvv[:, i_idx, j_idx], dtype=x.dtype)

    X = analysis(x, cfg.stft)  # [..., M, T, F]
    Zt = jnp.moveaxis(jnp.moveaxis(X, -3, -1), -3, 0)  # [T, ..., F, M]
    D = analysis(ds, cfg.stft)  # [..., T, F]
    Dt = jnp.moveaxis(D, -2, 0)

    state = msc_init(geometry.n_mics, cfg.half_bin, batch_shape=Zt.shape[1:-2], cdtype=Zt.dtype)
    _, W = jax.lax.scan(lambda s, z: mccowan_gain(cfg, fvv_pairs, s, z), state, Zt)
    Y = Dt * W.astype(Dt.dtype)
    return synthesis(jnp.moveaxis(Y, 0, -2), cfg.stft)
