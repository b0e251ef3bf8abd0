"""GSC-specific FLMS variants: CCAF-clamped blocking-matrix filter and
norm-constrained interference canceller.

Oracles: AdaptiveBlockingMatrixFilter.update
(/root/reference/DistantSpeech/beamformer/gsc_bm.py:61-120) and
AdaptiveInterferenceCancellation.update (gsc_aic.py:54-110).  Both share the
FLMS forward/gradient path (``adaptive.flms``) but replace the weight update:

- no 2x factor on the stepsize (W += p * mu * grad);
- BM: the "constraint" is a *time-domain coefficient clamp* around the
  centre tap (Hoshuyama CCAF bounds hardcoded to +-1e-3 away from the
  n_fft/4 peak, gsc_bm.py:48-59, :92-106) plus zeroing the last hop taps;
- AIC: optional filter-norm ceiling (maxnorm 0.003, gsc_aic.py:84-97)
  folded into the constraint projection.

Both reuse FlmsState; only single-channel BM / multichannel AIC layouts as
used by FDGSC.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from distantspeech_tpu.ops.dft import irdft, rdft
import numpy as np

from distantspeech_tpu.adaptive.flms import FlmsConfig, FlmsState
from distantspeech_tpu.ops.delay import delay_samples


def bm_bounds(n_fft: int, deltax: float = 0.001) -> np.ndarray:
    """Per-tap upper bounds of the BM CCAF clamp (gsc_bm.py:48-59).

    Returns [n_fft//2] array; lower bounds are ``-deltax`` everywhere
    (the reference's negative peaks keep the small bound).
    """
    ub = np.full(n_fft // 2, deltax)
    q = n_fft // 4
    ub[q] = 0.9
    ub[q + 1] = 0.3
    ub[q - 1] = 0.3
    ub[q + 2] = 0.05
    ub[q - 2] = 0.05
    return ub


def _forward(cfg: FlmsConfig, state: FlmsState, x, d):
    """Shared FLMS forward + gradient (compute_freq_conv / compute_freq_xcorr)."""
    hop, n_fft = cfg.hop, cfg.n_fft
    buf = jnp.concatenate([state.buf[..., hop:], x], axis=-1)
    X = rdft(buf, n=n_fft, axis=-1)
    P = cfg.alpha * state.P + (1.0 - cfg.alpha) * jnp.sum(jnp.real(X * jnp.conj(X)), axis=-2)
    y = irdft(jnp.sum(X * state.W, axis=-2), n=n_fft, axis=-1)[..., -hop:]

    d_delay = state.d_delay
    if cfg.non_causal:
        d_delay, d = delay_samples(state.d_delay, d)
    e = d - y

    pad = [(0, 0)] * (e.ndim - 1) + [(cfg.overlap, 0)]
    E = rdft(jnp.pad(e, pad), n=n_fft, axis=-1)
    P = jnp.maximum(P, 1e-4)
    grad = jnp.conj(X) * E[..., None, :] / P[..., None, :]
    return buf, P, e, grad, d_delay


def bm_step(
    cfg: FlmsConfig, state: FlmsState, x: jnp.ndarray, d: jnp.ndarray,
    update=True, p=1.0,
) -> Tuple[FlmsState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One hop of the adaptive blocking-matrix filter.

    x: [..., 1, hop] (the fixed-beamformer output); d: [..., hop] (the mic
    signal).  Returns (state, (e [..., hop], w [..., 1, filter_len])).
    """
    buf, P, e, grad, d_delay = _forward(cfg, state, x, d)

    gate = jnp.asarray(update, dtype=P.dtype)
    W = state.W + gate * p * cfg.mu * grad  # no 2x (gsc_bm.py:90)

    if cfg.constrain:
        w_full = irdft(W, n=cfg.n_fft, axis=-1)
        w_full = w_full.at[..., -cfg.hop :].set(0.0)
        nb = cfg.n_fft // 2
        ub = jnp.asarray(bm_bounds(cfg.n_fft), dtype=w_full.dtype)
        clamped = jnp.clip(w_full[..., :nb], -0.001, ub)
        w_full = jnp.concatenate([clamped, w_full[..., nb:]], axis=-1)
        W = rdft(w_full, n=cfg.n_fft, axis=-1)

    w = irdft(W, n=cfg.n_fft, axis=-1)[..., : cfg.filter_len]
    return FlmsState(buf=buf, W=W, P=P, foreground=state.foreground, d_delay=d_delay), (e, w)


def aic_step(
    cfg: FlmsConfig, state: FlmsState, x: jnp.ndarray, d: jnp.ndarray,
    update=True, p=1.0, weight_norm: bool = True, maxnorm: float = 0.003,
    fir_truncate: Optional[int] = None,
) -> Tuple[FlmsState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One hop of the norm-constrained interference canceller.

    x: [..., C, hop] blocking-matrix outputs; d: [..., hop] delayed FBF.
    """
    buf, P, e, grad, d_delay = _forward(cfg, state, x, d)

    gate = jnp.asarray(update, dtype=P.dtype)
    W = state.W + gate * p * cfg.mu * grad  # no 2x (gsc_aic.py:81)

    if weight_norm:
        norm = jnp.sum(jnp.abs(W) ** 2, axis=(-2, -1)) / cfg.n_fft / cfg.n_fft
        scale = jnp.where(norm > maxnorm, jnp.sqrt(maxnorm / norm), 1.0)
    else:
        scale = jnp.ones(W.shape[:-2], dtype=P.dtype)

    if cfg.constrain:
        w_full = irdft(W, n=cfg.n_fft, axis=-1) * scale[..., None, None]
        w_full = w_full.at[..., -cfg.hop :].set(0.0)
        W = rdft(w_full, n=cfg.n_fft, axis=-1)

    w = irdft(W, n=cfg.n_fft, axis=-1)[..., : cfg.filter_len]
    if fir_truncate is not None:
        w_shift = w.at[..., :fir_truncate].set(0.0).at[..., -fir_truncate:].set(0.0)
        W = rdft(w_shift * scale[..., None, None], n=cfg.n_fft, axis=-1)

    return FlmsState(buf=buf, W=W, P=P, foreground=state.foreground, d_delay=d_delay), (e, w)
