"""MCRA2 noise estimation (Rangachari & Loizou 2006), vectorised over bins.

Oracle: MCRA2.estimation (/root/reference/DistantSpeech/noise_estimation/mcra2.py:25-66).
Differences from classic MCRA: continuous minima tracking (no L-window reset)
and p initialised to 1 on the first frame.  Reference quirks reproduced:

- the loop runs k = 0 .. F-2 and frequency smoothing at k = 0 reads
  ``Y[-1]`` — NumPy wrap-around to the *last* bin (mcra2.py:34);
- ``S_pre = self.S`` is an **alias**, not a copy (mcra2.py:33): by the time
  the minima rule reads ``S_pre[k]`` the bin was already updated in place, so
  the increment term collapses to ``(1-gamma) * S_new`` — we reproduce the
  collapsed form, bit-for-bit equal to running the reference;
- p is clipped to [0, 1] inside the loop (mcra2.py:57) and the final-bin
  noise PSD is pinned to 1e-8 before the vectorised noise update over all
  bins (mcra2.py:62-64, NoiseEstimationBase.update_noise_psd:56-60).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Mcra2Config:
    nfft: int = 256
    alpha_s: float = 0.8
    alpha_d: float = 0.95
    alpha_p: float = 0.2
    delta_s: float = 5.0
    gamma: float = 0.998  # minima-tracking pole (mcra2.py:37)
    beta: float = 0.8  # minima-tracking lookback (mcra2.py:38)
    b: Tuple[float, float, float] = (0.25, 0.5, 0.25)

    @property
    def half_bin(self) -> int:
        return self.nfft // 2 + 1


class Mcra2State(NamedTuple):
    S: jnp.ndarray  # smoothed PSD      [..., F]
    Smin: jnp.ndarray  # tracked minimum [..., F]
    p: jnp.ndarray  # speech presence    [..., F]
    lambda_d: jnp.ndarray  # noise PSD   [..., F]
    frm_cnt: jnp.ndarray  # frame counter scalar int32


def mcra2_init(cfg: Mcra2Config, batch_shape=(), dtype=jnp.float32) -> Mcra2State:
    z = jnp.zeros((*batch_shape, cfg.half_bin), dtype=dtype)
    return Mcra2State(S=z, Smin=z, p=z, lambda_d=z, frm_cnt=jnp.asarray(0, jnp.int32))


def mcra2_step(cfg: Mcra2Config, state: Mcra2State, Y: jnp.ndarray) -> Tuple[Mcra2State, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One MCRA2 frame.  Y: [..., F] noisy power spectrum."""
    F = cfg.half_bin
    k = jnp.arange(F)
    lead = k <= F - 2  # bins the k-loop touches
    is_first = state.frm_cnt == 0

    # frequency smoothing with NumPy wrap-around at k=0 (Y[-1] = last bin)
    left = jnp.roll(Y, 1, axis=-1)
    right = jnp.concatenate([Y[..., 1:], Y[..., -1:]], axis=-1)  # k+1; k=F-2 reads Y[F-1]
    Sf = cfg.b[0] * left + cfg.b[1] * Y + cfg.b[2] * right

    S_new = cfg.alpha_s * state.S + (1.0 - cfg.alpha_s) * Sf
    # alias quirk: increment term uses the already-updated S (see module doc)
    Smin_track = cfg.gamma * state.Smin + (1.0 - cfg.gamma) * S_new
    Smin_new = jnp.where(state.Smin < S_new, Smin_track, S_new)

    Sr = S_new / (Smin_new + 1e-6)
    I = (Sr > cfg.delta_s).astype(Y.dtype)
    p_new = jnp.clip(cfg.alpha_p * state.p + (1.0 - cfg.alpha_p) * I, 0.0, 1.0)

    # first frame: seed Smin / lambda_d / p on lead bins, leave S at zero
    S_out = jnp.where(is_first, state.S, jnp.where(lead, S_new, state.S))
    Smin_out = jnp.where(is_first, jnp.where(lead, Y, state.Smin), jnp.where(lead, Smin_new, state.Smin))
    p_out = jnp.where(is_first, jnp.where(lead, jnp.ones_like(Y), state.p), jnp.where(lead, p_new, state.p))
    lam_pre = jnp.where(is_first, jnp.where(lead, Y, state.lambda_d), state.lambda_d)

    lam_pre = lam_pre.at[..., F - 1].set(1e-8)
    alpha_tilde = cfg.alpha_d + (1.0 - cfg.alpha_d) * p_out
    lam_out = alpha_tilde * lam_pre + (1.0 - alpha_tilde) * Y

    new_state = Mcra2State(S=S_out, Smin=Smin_out, p=p_out, lambda_d=lam_out, frm_cnt=state.frm_cnt + 1)
    return new_state, (lam_out, p_out)


def mcra2_run(cfg: Mcra2Config, Y_tf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan MCRA2 over a [T, ..., F] power spectrogram -> (lambda_d, p)."""
    state = mcra2_init(cfg, batch_shape=Y_tf.shape[1:-1], dtype=Y_tf.dtype)
    _, (lam, p) = jax.lax.scan(lambda s, y: mcra2_step(cfg, s, y), state, Y_tf)
    return lam, p
