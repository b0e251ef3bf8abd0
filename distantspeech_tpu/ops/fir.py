"""Streaming multichannel FIR filtering.

Oracle: fir_filter (/root/reference/DistantSpeech/beamformer/fixedbeamformer.py:13-48)
— the reference runs an O(samples * taps) per-channel scalar loop per block;
here the whole block convolves at once via a grouped ``lax.conv`` (one
channel's taps never mix into another's), with the K-1 tail samples carried
between blocks exactly like the reference's ``fir_cache``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def fir_filter_block(
    cache: jnp.ndarray, x: jnp.ndarray, coeffs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal per-channel FIR of one block.

    cache: [..., C, K-1] carried input tail; x: [..., C, L] block;
    coeffs: [C, K] per-channel taps (tap 0 oldest, like the reference's
    column layout before its flipud).
    Returns (new_cache [..., C, K-1], y [..., C, L]) where
    y[n] = sum_k flip(coeffs)[k] * ext[n + k],  ext = [cache, x].
    """
    K = coeffs.shape[-1]
    ext = jnp.concatenate([cache, x], axis=-1)  # [..., C, K-1+L]
    C = coeffs.shape[0]
    batch = ext.shape[:-2]
    lhs = ext.reshape((-1, C, ext.shape[-1]))  # [N, C, S]
    rhs = jnp.flip(coeffs, axis=-1)[:, None, :]  # [C, 1, K] per-group kernel
    y = jax.lax.conv_general_dilated(
        lhs, rhs.astype(lhs.dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=C,
    )
    y = y.reshape((*batch, C, -1))
    return ext[..., -(K - 1):] if K > 1 else cache, y


def fir_filter_offline(x: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Whole-utterance causal FIR from zero cache: x [..., C, S] -> [..., C, S]."""
    K = coeffs.shape[-1]
    cache = jnp.zeros((*x.shape[:-1], K - 1), dtype=x.dtype)
    _, y = fir_filter_block(cache, x, coeffs)
    return y
