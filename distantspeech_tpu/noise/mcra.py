"""MCRA noise estimation (Cohen & Berdugo 2002), vectorised over bins.

Bit-exact re-expression of the reference's per-bin scalar loop
(/root/reference/DistantSpeech/noise_estimation/mcra.py:27-77 and
NoiseEstimationBase.py:56-60) as a pure per-frame step over ``[..., F]``
tensors, suitable for ``lax.scan`` over frames and sharding over bins.

Reference semantics preserved exactly (these are the parity-sensitive bits):

- only bins ``0 .. F-2`` are touched by the estimator; the last bin's speech
  presence stays at its clipped floor and its noise PSD is pinned to 1e-8
  before each noise update (mcra.py:73);
- frame 0 seeds Smin/Stmp/lambda_d with the raw power spectrum and leaves the
  smoothed PSD S at zero (mcra.py:38-41);
- the minima-tracking window reset triggers when the shared frame counter
  ``ell`` hits a multiple of L *at frame start*; the reference zeroes ``ell``
  inside the bin loop so the reset applies uniformly to every bin of that
  frame, after which ``ell`` resumes from 1 (mcra.py:52-57, :74);
- speech-presence p is forced to zero for the first 2L frames (mcra.py:68-69)
  and clipped to [p_min, p_max] *in the stored state* (mcra.py:70), so the
  next frame's recursion sees the clipped value;
- k = 0 gets p = 0 every frame (mcra.py:44).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class McraConfig:
    nfft: int = 256
    L: int = 15  # minima-tracking window (mcra.py:25)
    alpha_s: float = 0.8
    alpha_d: float = 0.95
    alpha_p: float = 0.2
    delta_s: float = 5.0
    p_max: float = 0.999
    p_min: float = 1e-3
    b: Tuple[float, float, float] = (0.25, 0.5, 0.25)

    @property
    def half_bin(self) -> int:
        return self.nfft // 2 + 1


class McraState(NamedTuple):
    S: jnp.ndarray  # smoothed PSD              [..., F]
    Smin: jnp.ndarray  # tracked minimum        [..., F]
    Stmp: jnp.ndarray  # window minimum         [..., F]
    p: jnp.ndarray  # speech presence (clipped) [..., F]
    lambda_d: jnp.ndarray  # noise PSD          [..., F]
    ell: jnp.ndarray  # window frame counter    scalar int32
    frm_cnt: jnp.ndarray  # total frame counter scalar int32


def mcra_init(cfg: McraConfig, batch_shape=(), dtype=jnp.float32) -> McraState:
    F = cfg.half_bin
    z = jnp.zeros((*batch_shape, F), dtype=dtype)
    return McraState(
        S=z,
        Smin=z,
        Stmp=z,
        p=z,
        lambda_d=z,
        ell=jnp.asarray(1, jnp.int32),
        frm_cnt=jnp.asarray(0, jnp.int32),
    )


def _freq_smooth(Y: jnp.ndarray, b) -> jnp.ndarray:
    """b[0]*Y[k-1] + b[1]*Y[k] + b[2]*Y[k+1]; edges unused by the caller."""
    left = jnp.concatenate([Y[..., :1], Y[..., :-1]], axis=-1)
    right = jnp.concatenate([Y[..., 1:], Y[..., -1:]], axis=-1)
    return b[0] * left + b[1] * Y + b[2] * right


def mcra_step(cfg: McraConfig, state: McraState, Y: jnp.ndarray) -> Tuple[McraState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One MCRA frame.

    Y: [..., F] noisy power spectrum (|X|^2 of the reference channel).
    Returns (new_state, (lambda_d, p)).
    """
    F = cfg.half_bin
    k = jnp.arange(F)
    interior = (k >= 1) & (k <= F - 2)  # bins updated by the recursion
    lead = k <= F - 2  # bins seeded on frame 0
    is_first = state.frm_cnt == 0

    # ---- recursion path (frames >= 1) -------------------------------------
    Sf = _freq_smooth(Y, cfg.b)
    S_upd = cfg.alpha_s * state.S + (1.0 - cfg.alpha_s) * Sf
    S_new = jnp.where(interior, S_upd, state.S)

    Smin1 = jnp.minimum(state.Smin, S_new)
    Stmp1 = jnp.minimum(state.Stmp, S_new)
    reset = (state.ell % cfg.L) == 0
    Smin2 = jnp.where(reset, jnp.minimum(Stmp1, S_new), Smin1)
    Stmp2 = jnp.where(reset, S_new, Stmp1)
    Smin_new = jnp.where(interior, Smin2, state.Smin)
    Stmp_new = jnp.where(interior, Stmp2, state.Stmp)

    Sr = S_new / (Smin_new + 1e-6)
    I = (Sr > cfg.delta_s).astype(Y.dtype)
    p_upd = cfg.alpha_p * state.p + (1.0 - cfg.alpha_p) * I
    p_upd = jnp.where(state.frm_cnt < 2 * cfg.L, jnp.zeros_like(p_upd), p_upd)
    p_rec = jnp.where(interior, p_upd, state.p)
    p_rec = p_rec.at[..., 0].set(0.0)

    # ---- first-frame seeding path -----------------------------------------
    Smin_seed = jnp.where(lead, Y, state.Smin)
    Stmp_seed = jnp.where(lead, Y, state.Stmp)
    lam_seed = jnp.where(lead, Y, state.lambda_d)
    p_seed = jnp.where(lead, jnp.zeros_like(state.p), state.p)

    # ---- select + shared tail ---------------------------------------------
    S_out = jnp.where(is_first, state.S, S_new)
    Smin_out = jnp.where(is_first, Smin_seed, Smin_new)
    Stmp_out = jnp.where(is_first, Stmp_seed, Stmp_new)
    p_sel = jnp.where(is_first, p_seed, p_rec)
    p_out = jnp.clip(p_sel, cfg.p_min, cfg.p_max)

    lam_pre = jnp.where(is_first, lam_seed, state.lambda_d)
    lam_pre = lam_pre.at[..., F - 1].set(1e-8)
    alpha_tilde = cfg.alpha_d + (1.0 - cfg.alpha_d) * p_out
    lam_out = alpha_tilde * lam_pre + (1.0 - alpha_tilde) * Y

    ell_new = jnp.where(is_first | ~reset, state.ell + 1, jnp.asarray(1, jnp.int32))
    new_state = McraState(
        S=S_out,
        Smin=Smin_out,
        Stmp=Stmp_out,
        p=p_out,
        lambda_d=lam_out,
        ell=ell_new.astype(jnp.int32),
        frm_cnt=state.frm_cnt + 1,
    )
    return new_state, (lam_out, p_out)


def mcra_run(cfg: McraConfig, Y_tf: jnp.ndarray, unroll: int = 8, return_sr: bool = False):
    """Scan MCRA over a whole spectrogram.

    Y_tf: [T, ..., F] power spectrum, time-major.
    Returns (lambda_d [T, ..., F], p [T, ..., F]); with ``return_sr`` also
    the raw per-frame speech indicator ratio S/Smin (the statistic p is
    filtered from, without the 2L warmup forcing — see MvdrConfig.vad_guard).
    """
    state = mcra_init(cfg, batch_shape=Y_tf.shape[1:-1], dtype=Y_tf.dtype)

    def body(s, y):
        s2, (lam, p) = mcra_step(cfg, s, y)
        if return_sr:
            return s2, (lam, p, s2.S / (s2.Smin + 1e-6))
        return s2, (lam, p)

    _, out = jax.lax.scan(body, state, Y_tf, unroll=unroll)
    return out
