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


def affine_recurrence(A: jnp.ndarray, b: jnp.ndarray, s0: jnp.ndarray) -> jnp.ndarray:
    """Solve s[n] = A[n] @ s[n-1] + b[n] for small state dim k.

    A: [..., N, k, k]; b: [..., N, k]; s0: [..., k].
    Returns s: [..., N, k] (the state after absorbing each step).
    """

    def combine(left, right):
        A1, b1 = left
        A2, b2 = right
        return A2 @ A1, jnp.einsum("...ij,...j->...i", A2, b1) + b2

    Acum, bcum = jax.lax.associative_scan(combine, (A, b), axis=-3)
    return jnp.einsum("...nij,...j->...ni", Acum, s0) + bcum
