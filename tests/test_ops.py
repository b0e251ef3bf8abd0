"""Tests for framing/delay/IIR primitives vs. reference semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.ops.delay import delay_frames, delay_frames_init, delay_samples, delay_samples_init
from distantspeech_tpu.ops.iir import affine_recurrence, first_order_recurrence


@pytest.mark.parametrize("data_len,delay", [(1, 0), (10, 5), (10, 50), (100, 7), (64, 64)])
def test_delay_samples_parity(data_len, delay):
    utils = refutil.load("DistantSpeech.beamformer.utils")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000 // data_len * data_len, 1))

    ref = utils.DelaySamples(data_len, delay)
    carry = delay_samples_init((), delay, dtype=jnp.float64)
    for n in range(x.shape[0] // data_len):
        blk = x[n * data_len : (n + 1) * data_len, 0]
        out_ref = ref.delay(blk)[:, 0]
        carry, out = delay_samples(carry, jnp.asarray(blk))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-12)


def test_delay_frames_parity():
    utils = refutil.load("DistantSpeech.beamformer.utils")
    rng = np.random.default_rng(1)
    F, T, d = 8, 30, 3
    x = rng.standard_normal((T, F))

    ref = utils.DelayFrames(F, d)
    carry = delay_frames_init((), d + 1, (F,), dtype=jnp.float64)
    for t in range(T):
        out_ref = ref.delay(x[t])
        carry, out = delay_frames(carry, jnp.asarray(x[t]))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-12)


def test_first_order_recurrence_matches_loop():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(500)
    a, s0 = 0.97, 0.5
    want = np.zeros(500)
    s = s0
    for n in range(500):
        s = a * s + x[n]
        want[n] = s
    got = first_order_recurrence(a, jnp.asarray(x), s0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-11)


def test_affine_recurrence_matches_loop():
    rng = np.random.default_rng(3)
    N, k = 200, 2
    A = rng.standard_normal((N, k, k)) * 0.4
    b = rng.standard_normal((N, k))
    s0 = rng.standard_normal(k)
    want = np.zeros((N, k))
    s = s0
    for n in range(N):
        s = A[n] @ s + b[n]
        want[n] = s
    got = affine_recurrence(jnp.asarray(A), jnp.asarray(b), jnp.asarray(s0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8, atol=1e-10)


def test_fir_taps_matrix_paths_agree():
    """The three FIR entry points — per-block with raw coeffs, per-block
    with a precomputed fir_block_taps matrix (the scan-body form), and the
    blocked offline driver — produce the same causal convolution as a
    NumPy reference."""
    import jax.numpy as jnp

    from distantspeech_tpu.ops.fir import fir_block_taps, fir_filter_block, fir_filter_offline

    rng = np.random.default_rng(11)
    C, K, L, nblk = 3, 17, 64, 5
    coeffs = rng.standard_normal((C, K))
    x = rng.standard_normal((C, L * nblk))

    # NumPy causal reference: y[n] = sum_k flip(c)[k] * ext[n+k]
    ext = np.concatenate([np.zeros((C, K - 1)), x], axis=-1)
    y_ref = np.stack([np.convolve(ext[c], coeffs[c])[K - 1 : K - 1 + x.shape[-1]]
                      for c in range(C)])

    y_off = np.asarray(fir_filter_offline(jnp.asarray(x), jnp.asarray(coeffs), block=L))
    np.testing.assert_allclose(y_off, y_ref, atol=1e-10)

    taps = fir_block_taps(jnp.asarray(coeffs), L)
    cache1 = jnp.zeros((C, K - 1))
    cache2 = jnp.zeros((C, K - 1))
    outs1, outs2 = [], []
    for b in range(nblk):
        blk = jnp.asarray(x[:, b * L : (b + 1) * L])
        cache1, y1 = fir_filter_block(cache1, blk, jnp.asarray(coeffs))
        cache2, y2 = fir_filter_block(cache2, blk, taps)
        outs1.append(np.asarray(y1))
        outs2.append(np.asarray(y2))
    np.testing.assert_allclose(np.concatenate(outs1, -1), y_ref, atol=1e-10)
    np.testing.assert_array_equal(np.concatenate(outs1, -1), np.concatenate(outs2, -1))
