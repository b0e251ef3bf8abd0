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


def frac_delay(
    delta: float, N: int, w_max: float = 0.9, C: int = 4, iters: int = 200, tol: float = 1e-12
) -> np.ndarray:
    """Minimax-optimal fractional-delay FIR (multirate.py:54-113 semantics:
    Putnam & Smith, "Design of Fractional Delay Filters Using Convex
    Optimization").

    The reference solves the epigraph SOCP ``min t s.t.
    |F(w_i) h - e^(-j w_i delta)| <= t`` with cvxopt; cvxopt is not in this
    image, so the same Chebyshev solution is computed with Lawson's
    iteratively-reweighted least squares — each iteration is one small
    [2*C*N, N] real ``lstsq`` and the weight fixed point is exactly the
    minimax optimum on the constraint grid.  Deterministic, scipy/NumPy
    only.
    """
    N_C = int(C * N)
    w = np.linspace(0, w_max * np.pi, N_C)
    n = np.arange(N)
    F = np.exp(-1j * w[:, None] * n)  # [N_C, N]
    d = np.exp(-1j * w * delta)

    # stacked real system: rows (Re; Im) of F h = d
    A = np.concatenate([F.real, F.imag], axis=0)
    y = np.concatenate([d.real, d.imag])

    wt = np.ones(N_C)
    h = None
    prev = np.inf
    for _ in range(iters):
        sw = np.concatenate([np.sqrt(wt), np.sqrt(wt)])  # same weight for the (Re, Im) rows
        h, *_ = np.linalg.lstsq(A * sw[:, None], y * sw, rcond=None)
        err = np.abs(F @ h - d)
        # Lawson update: w_i <- w_i * |e_i|, renormalised
        wt = wt * np.maximum(err, 1e-30)
        wt /= wt.sum()
        emax = err.max()
        if abs(prev - emax) < tol * max(emax, 1e-30):
            break
        prev = emax
    return h


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
