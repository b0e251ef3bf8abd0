"""Coherent-to-diffuse-ratio speech presence (Schwarz & Kellermann 2015).

Oracle: McCDR.estimation / estimate_ddr
(/root/reference/DistantSpeech/noise_estimation/mccdr.py:126-182): the
unbiased CDR estimator (eq. 25 of [Schwarz15]) on the (1,2) mic pair of a
circular array, fused with an MCRA speech-presence track of the reference
channel.  The output Gamma = sqrt(CDR^2_clipped * p_mcra) is consumed by
McSpp as ``q = 1 - Gamma`` (mcspp.py:116-117).

The reference hard-codes the coherence estimator's array model to a circular
r = 0.032 array of ``channels`` mics (mccdr.py:64-66); the diffuse coherence
Fn of the (1,2) pair is designed host-side here.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from distantspeech_tpu.array.coherence import diffuse_coherence
from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.coherence.msc import MscState, msc_init, msc_update, pair_index
from distantspeech_tpu.noise.mcra import McraConfig, McraState, mcra_init, mcra_step


@dataclasses.dataclass(frozen=True)
class McCdrConfig:
    nfft: int = 256
    n_channels: int = 4
    alpha_msc: float = 0.9  # coherence recursion (mccdr.py:133)
    radius: float = 0.032

    @property
    def half_bin(self) -> int:
        return self.nfft // 2 + 1

    @property
    def mcra(self) -> McraConfig:
        return McraConfig(nfft=self.nfft, L=65)  # mccdr.py:62-63

    def fn_pair(self) -> np.ndarray:
        """Diffuse coherence of the (1,2) pair, [F] float64 (mccdr.py:141)."""
        geom = ArrayGeometry.circular(self.n_channels, self.radius, c=343.0)
        return diffuse_coherence(geom, self.nfft)[:, 1, 2]


class McCdrState(NamedTuple):
    msc: MscState
    mcra: McraState


def mccdr_init(cfg: McCdrConfig, batch_shape=(), cdtype=jnp.complex64) -> McCdrState:
    rdtype = jnp.zeros(0, dtype=cdtype).real.dtype
    return McCdrState(
        msc=msc_init(cfg.n_channels, cfg.half_bin, batch_shape, cdtype=cdtype),
        mcra=mcra_init(cfg.mcra, batch_shape, dtype=rdtype),
    )


def mccdr_step(
    cfg: McCdrConfig, Fn: jnp.ndarray, state: McCdrState, y: jnp.ndarray
) -> Tuple[McCdrState, jnp.ndarray]:
    """One CDR frame.

    Fn: [F] diffuse coherence of pair (1,2) (from ``cfg.fn_pair()``);
    y: [..., F, C] complex spectrum.  Returns (new_state, Gamma [..., F]).
    """
    msc_state, Fvv_est = msc_update(state.msc, y, cfg.alpha_msc)
    Fx = Fvv_est[..., pair_index(cfg.n_channels, 1, 2)]
    Fx2 = jnp.abs(Fx) ** 2
    Fxr = jnp.real(Fx)
    Fn2 = Fn**2

    # unbiased CDR estimator, eq.[25] in [Schwarz15] (mccdr.py:139-146).
    # The radicand is analytically >= 0 for |Fx| <= 1 but cancels to a tiny
    # negative under fused float32 arithmetic when |Fx| ~ 1 (XLA scan
    # bodies reorder it differently from eager NumPy), and sqrt(-eps) = NaN
    # then smears through the synthesis matmuls — clamp at 0 (exact
    # whenever the true value is nonnegative).
    rad = Fn2 * Fxr**2 - Fn2 * Fx2 + Fn2 - 2.0 * Fn * Fxr + Fx2
    num = Fn * Fxr - Fx2 - jnp.sqrt(jnp.maximum(rad, 0.0))
    Gamma = num / jnp.minimum(Fx2 - 1.0, -1e-3)
    Gamma = Gamma**2
    Gamma = jnp.where(Gamma > 1.0, 1.0, Gamma)
    Gamma = jnp.where(Gamma < 0.0, 1e-3, Gamma)

    power = jnp.abs(y[..., 0]) ** 2  # complex input path of mcra.estimation (mcra.py:29-30)
    mcra_state, (_, p_mcra) = mcra_step(cfg.mcra, state.mcra, power)

    return McCdrState(msc=msc_state, mcra=mcra_state), jnp.sqrt(Gamma * p_mcra)
