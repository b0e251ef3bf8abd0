"""Pure-functional block delay lines.

Re-expressions of the reference's mutable delay buffers as explicit
``(carry, x) -> (carry, y)`` steps:

- ``delay_samples``: DelaySamples (/root/reference/DistantSpeech/beamformer/
  utils.py:241-274) — an exact D-sample delay applied blockwise, valid for
  any relation between block length and delay;
- ``delay_frames``: DelayFrames (utils.py:215-239) — note the reference's
  off-by-one: ``DelayFrames(len, d)`` delays by **d + 1** frames (the read
  happens before the push into a (d+1)-row buffer).  The FastFreqLms-local
  DelayObj (FastFreqLms.py:24-46) has DelaySamples semantics and is covered
  by ``delay_samples``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def delay_samples_init(batch_shape, delay: int, dtype=jnp.float32) -> jnp.ndarray:
    """Carry for ``delay_samples``: the last ``delay`` samples, zeros at start."""
    return jnp.zeros((*batch_shape, delay), dtype=dtype)


def delay_samples(carry: jnp.ndarray, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Delay a block by ``carry.shape[-1]`` samples.

    carry: [..., D]; x: [..., L].  Returns (new_carry [..., D], y [..., L]).
    """
    D = carry.shape[-1]
    if D == 0:
        return carry, x
    L = x.shape[-1]
    buf = jnp.concatenate([carry, x], axis=-1)  # [..., D + L]
    return buf[..., L:], buf[..., :L]


def delay_frames_init(batch_shape, n_slots: int, frame_shape, dtype=jnp.float32) -> jnp.ndarray:
    """Carry for ``delay_frames``: ``n_slots = delay + 1`` queued frames."""
    return jnp.zeros((*batch_shape, n_slots, *frame_shape), dtype=dtype)


def delay_frames(carry: jnp.ndarray, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FIFO of frames: returns the frame pushed ``n_slots`` calls ago.

    carry: [..., S, *frame]; x: [..., *frame].
    """
    out = carry[..., 0, :]
    new = jnp.concatenate([carry[..., 1:, :], x[..., None, :]], axis=-2)
    return new, out
