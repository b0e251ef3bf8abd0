"""Log-depth linear recurrences via ``jax.lax.associative_scan``.

The reference runs its IIR filters sample-by-sample in Python
(Emphasis / FilterDcNotch16, /root/reference/DistantSpeech/adaptivefilter/
feature.py:7-63).  A first-order (or small-state affine) recurrence

    s[n] = A[n] s[n-1] + b[n]

is associative under composition (A2 A1, A2 b1 + b2), so on TPU we evaluate
it in O(log N) depth with full vector-unit utilisation instead of an
N-step scan.  For the short per-block streams of the realtime path the
difference is minor, but for whole-utterance offline processing this is the
difference between serial sample code and a parallel tensor program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def first_order_recurrence(a, b: jnp.ndarray, s0) -> jnp.ndarray:
    """Solve s[n] = a * s[n-1] + b[n] over the last axis, s[-1] = s0.

    a: scalar or [..., N] per-step coefficient; b: [..., N]; s0: scalar or
    [...] initial state.  Returns s: [..., N].
    """
    a_arr = jnp.broadcast_to(jnp.asarray(a, dtype=b.dtype), b.shape)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    A, B = jax.lax.associative_scan(combine, (a_arr, b), axis=-1)
    s0 = jnp.asarray(s0, dtype=b.dtype)
    if s0.ndim:
        s0 = s0[..., None]
    return A * s0 + B


def complex_pole_recurrence(
    ar: float, ai: float, br: jnp.ndarray, bi: jnp.ndarray, z0r: jnp.ndarray, z0i: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve z[n] = (ar + j*ai) z[n-1] + (br[n] + j*bi[n]) over the last axis.

    Carried as two REAL arrays with the sample axis last: complex dtypes are
    avoided entirely (eager complex constants are UNIMPLEMENTED over the
    axon tunnel) and the lane axis is the long N axis — the layout that
    makes the log-depth scan fast.  This is the diagonalised form of any
    real 2x2 constant-matrix recurrence with complex-conjugate eigenvalues
    (e.g. the speex DC-notch biquad): one complex pole carries the whole
    2-state dynamics because the second state is its conjugate.

    ar, ai: python floats (the pole); br, bi: [..., N]; z0r, z0i: [...].
    Returns (zr, zi): [..., N] (state after absorbing each step).
    """
    a_r = jnp.full_like(br, ar)
    a_i = jnp.full_like(br, ai)

    def combine(left, right):
        lar, lai, lbr, lbi = left
        rar, rai, rbr, rbi = right
        return (
            rar * lar - rai * lai,
            rar * lai + rai * lar,
            rar * lbr - rai * lbi + rbr,
            rar * lbi + rai * lbr + rbi,
        )

    Ar, Ai, Br, Bi = jax.lax.associative_scan(combine, (a_r, a_i, br, bi), axis=-1)
    z0r = z0r[..., None]
    z0i = z0i[..., None]
    return Ar * z0r - Ai * z0i + Br, Ar * z0i + Ai * z0r + Bi


def affine_recurrence(A: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray) -> jnp.ndarray:
    """Solve s[n] = A[n] @ s[n-1] + b[n] for small state dim k.

    A: [..., N, k, k]; b: [..., N, k]; s0: [..., k].
    Returns s: [..., N, k] (the state after absorbing each step).
    """

    def combine(left, right):
        A1, b1 = left
        A2, b2 = right
        # A2 @ A1 / A2 @ b1 as broadcast-multiply-reduce: a batched k x k
        # dot_general over the huge N axis lowers to per-element MXU
        # dispatches on TPU (see stats.linalg.matvec) — measured as the
        # entire 0.9 s/iter TDGSC-family preprocessing floor in round 3.
        A21 = jnp.sum(A2[..., :, :, None] * A1[..., None, :, :], axis=-2)
        b21 = jnp.sum(A2 * b1[..., None, :], axis=-1) + b2
        return A21, b21

    Acum, bcum = jax.lax.associative_scan(combine, (A, b), axis=-3)
    return jnp.sum(Acum * s0[..., None, None, :], axis=-1) + bcum
