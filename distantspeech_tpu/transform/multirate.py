"""Multirate utilities: remez lowpass, rational resampling, optimal
fractional delay, and the overlap-save FFT convolution.

Oracles: low_pass / resample / frac_delay
(/root/reference/DistantSpeech/transform/multirate.py:54-168 — the
fractional-delay *bank* lives in ``array.alignment``) and overlap_save
(common/OverlapSave.py:16-48).  Host-side design helpers stay NumPy/SciPy;
``overlap_save`` is jnp and batched (it is the algorithmic core the FLMS
family builds on, kept standalone for capability parity and as a test
oracle).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def low_pass(numtaps: int, B: float, epsilon: float = 0.1) -> np.ndarray:
    """Remez lowpass with transition band epsilon*B (multirate.py:116-140)."""
    from scipy.signal import remez

    return remez(numtaps, [0, (1 - epsilon) * B, B, 0.5], [1, 0], grid_density=32)


def resample(x: np.ndarray, p: int, q: int) -> np.ndarray:
    """Rational-rate resampling by p/q (multirate.py:142-168, with the
    Python-3 fixes its bit-rotted fractions.gcd / float indexing need)."""
    from scipy.signal import fftconvolve

    g = math.gcd(p, q)
    p, q = p // g, q // g
    m = max(p, q)
    h = low_pass(10 * m + 1, 1.0 / (2.0 * m))
    x_up = np.kron(x, np.concatenate(([1.0], np.zeros(p - 1))))
    x_rs = fftconvolve(x_up, h)
    x_ds = x_rs[h.shape[0] // 2 + 1 :: q]
    return x_ds[: int(np.floor(x.shape[0] * p / q))]


def frac_delay(delta: float, N: int, w_max: float = 0.9, C: int = 4) -> np.ndarray:
    """Convex-optimal fractional-delay filter (multirate.py:54-113).

    Requires cvxopt (not in this image) — raises ImportError with the same
    guidance as the reference if absent; the windowed-sinc bank
    (``array.alignment.fractional_delay_filter_bank``) is the supported path.
    """
    try:
        from cvxopt import matrix, solvers
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError("frac_delay requires the cvxopt module; use array.alignment instead") from e

    N_C = int(C * N)
    w = np.linspace(0, w_max * np.pi, N_C)[:, None]
    n = np.arange(N)
    f = np.concatenate((np.zeros(N), np.ones(1)))
    A, b = [], []
    for i in range(N_C):
        Anp = np.concatenate(([np.cos(w[i] * n), -np.sin(w[i] * n)], [[0], [0]]), axis=1)
        Anp = np.concatenate(([-f], Anp), axis=0)
        A.append(matrix(Anp))
        b.append(matrix(np.concatenate(([0], np.cos(w[i] * delta), -np.sin(w[i] * delta)))))
    solvers.options["show_progress"] = False
    sol = solvers.socp(matrix(f), Gq=A, hq=b)
    return np.array(sol["x"])[:-1, 0]


def overlap_save(signal: jnp.ndarray, filt: jnp.ndarray, stride: int = 4, pad_start: bool = True) -> jnp.ndarray:
    """Overlap-save FFT convolution (OverlapSave.py:16-48), batched.

    signal: [..., S]; filt: [K].  Returns [..., S] (same trailing tail
    behaviour as the reference: output beyond the last full block is zero).
    """
    filt = jnp.ravel(filt)
    K = filt.shape[0]
    min_win = stride + K - 1
    n_fft = int(2 ** (int(np.log2(min_win)) + 1))

    if pad_start:
        pad = [(0, 0)] * (signal.ndim - 1) + [(n_fft - stride - K + stride - 1, 0)]
        signal = jnp.pad(signal, pad)

    W = jnp.fft.rfft(filt, n=n_fft)
    S = signal.shape[-1]
    n_block = (S - n_fft) // stride
    idx = np.arange(n_block)[:, None] * stride + np.arange(n_fft)[None, :]
    blocks = signal[..., idx]  # [..., n_block, n_fft]
    y = jnp.fft.irfft(W * jnp.fft.rfft(blocks, axis=-1), n=n_fft, axis=-1)
    valid = y[..., -(n_fft - K + 1) :][..., :stride]  # [..., n_block, stride]
    out = jnp.zeros_like(signal)
    flat = valid.reshape(*valid.shape[:-2], n_block * stride)
    return out.at[..., : n_block * stride].set(flat)
