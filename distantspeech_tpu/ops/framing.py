"""Framing and overlap-add primitives.

These are the two memory-movement halves of every analysis/synthesis
filterbank.  Both are written so XLA lowers them to cheap, fusable ops:

- ``frame_signal`` is a gather with a statically-known index matrix (XLA
  turns it into strided loads; no data-dependent shapes).
- ``overlap_add`` avoids scatter-add entirely when ``frame_len`` is a
  multiple of ``hop`` (every STFT/subband config in this framework): the
  frames are split into ``R = frame_len // hop`` hop-sized lanes, each lane
  concatenates into a contiguous stream, and the R shifted streams are summed
  — pure reshapes, pads and adds, which XLA fuses into one pass over HBM.
  This replaces the reference's numba scalar overlap-add loop
  (/root/reference/DistantSpeech/transform/transform.py:224-234).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Slice ``x`` into overlapping frames.

    Parameters
    ----------
    x : [..., samples]
    frame_len, hop : static ints

    Returns
    -------
    frames : [..., n_frames, frame_len] where
        n_frames = 1 + (samples - frame_len) // hop  (tail truncated).
    """
    samples = x.shape[-1]
    n_frames = 1 + (samples - frame_len) // hop
    if frame_len % hop == 0:
        # Overlapping frames as R shifted views of hop-sized blocks: pure
        # reshape + slice + concat, no gather and no index constants (which
        # blow up compile time for long signals).
        r = frame_len // hop
        blocks = x[..., : (n_frames + r - 1) * hop]
        blocks = blocks.reshape(*x.shape[:-1], n_frames + r - 1, hop)
        return jnp.concatenate([blocks[..., j : j + n_frames, :] for j in range(r)], axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add frames spaced ``hop`` samples apart.

    Parameters
    ----------
    frames : [..., n_frames, frame_len]

    Returns
    -------
    y : [..., frame_len + hop * (n_frames - 1)]
    """
    *batch, n_frames, frame_len = frames.shape
    out_len = frame_len + hop * (n_frames - 1)
    if frame_len % hop == 0:
        r = frame_len // hop
        # [..., T, R, hop] -> R shifted streams of length T*hop
        lanes = frames.reshape(*batch, n_frames, r, hop)
        y = jnp.zeros((*batch, out_len), dtype=frames.dtype)
        for j in range(r):
            stream = lanes[..., :, j, :].reshape(*batch, n_frames * hop)
            y = y.at[..., j * hop : j * hop + n_frames * hop].add(stream)
        return y
    # General fallback: scatter-add.
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    y = jnp.zeros((*batch, out_len), dtype=frames.dtype)
    return y.at[..., idx.reshape(-1)].add(frames.reshape(*batch, -1))
