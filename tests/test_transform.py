"""Parity + invariance tests for the STFT/ISTFT transform."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.transform import (
    StftConfig,
    analysis,
    istft_stream,
    sqrt_hann_window,
    stft_stream,
    synthesis,
)
from distantspeech_tpu.transform.stft import stft_init_carry


@pytest.fixture(scope="module")
def ref_transform_mod():
    return refutil.load("DistantSpeech.transform.transform")


def _rand(n, c=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (n,) if c is None else (n, c)
    return rng.standard_normal(shape)


def test_window_matches_reference(ref_transform_mod):
    ref = ref_transform_mod.Transform(n_fft=256, hop_length=128, channel=1)
    np.testing.assert_allclose(sqrt_hann_window(256), ref.window, atol=1e-12)
    assert StftConfig(256, 128).w0 == pytest.approx(ref.W0)


@pytest.mark.parametrize("n_fft,hop,channels", [(256, 128, 1), (256, 128, 4), (512, 256, 2), (320, 160, 3)])
def test_offline_stft_parity(ref_transform_mod, n_fft, hop, channels):
    cfg = StftConfig(n_fft, hop)
    x = _rand(hop * 50, channels)

    ref = ref_transform_mod.Transform(n_fft=n_fft, hop_length=hop, channel=channels)
    Y_ref = ref.stft(x)  # [half_bin, T, C]

    Y_ours = np.asarray(analysis(jnp.asarray(x.T), cfg))  # [C, T, F]
    assert Y_ours.shape == (channels, Y_ref.shape[1], cfg.half_bin)
    np.testing.assert_allclose(Y_ours.transpose(2, 1, 0), Y_ref, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop", [(256, 128), (512, 256)])
def test_offline_istft_parity(ref_transform_mod, n_fft, hop):
    cfg = StftConfig(n_fft, hop)
    T = 40
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((cfg.half_bin, T, 1)) + 1j * rng.standard_normal((cfg.half_bin, T, 1))

    ref = ref_transform_mod.Transform(n_fft=n_fft, hop_length=hop, channel=1)
    y_ref = ref.istft(Y)  # [hop*T]

    y_ours = np.asarray(synthesis(jnp.asarray(Y[:, :, 0].T), cfg))
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-8)


def test_streaming_matches_reference_over_chunks(ref_transform_mod):
    """Chunked analysis->synthesis matches the reference streaming classes."""
    cfg = StftConfig(256, 128)
    chunk = 512
    x = _rand(chunk * 10, 2, seed=3)

    ref = ref_transform_mod.Transform(n_fft=256, hop_length=128, channel=2)
    in_carry = stft_init_carry((2,), cfg, dtype=jnp.float64)
    out_carry = jnp.zeros((2, cfg.overlap), dtype=jnp.float64)

    for i in range(10):
        xc = x[i * chunk : (i + 1) * chunk]
        Y_ref = ref.stft(xc)
        y_ref = ref.istft(Y_ref)

        in_carry, Y = stft_stream(in_carry, jnp.asarray(xc.T), cfg)
        np.testing.assert_allclose(np.asarray(Y).transpose(2, 1, 0), Y_ref, atol=1e-6)

        out_carry, y = istft_stream(out_carry, Y, cfg)
        np.testing.assert_allclose(np.asarray(y).T, y_ref, atol=1e-6)


def test_streaming_equals_offline():
    cfg = StftConfig(256, 128)
    x = jnp.asarray(_rand(128 * 64, seed=5))
    Y_off = analysis(x, cfg)

    carry = stft_init_carry((), cfg, dtype=x.dtype)
    ys = []
    for i in range(8):
        carry, Y = stft_stream(carry, x[i * 1024 : (i + 1) * 1024], cfg)
        ys.append(Y)
    Y_stream = jnp.concatenate(ys, axis=0)
    np.testing.assert_allclose(np.asarray(Y_stream), np.asarray(Y_off), atol=1e-10)

    # synthesis side
    y_off = synthesis(Y_off, cfg)
    carry = jnp.zeros((cfg.overlap,), dtype=x.dtype)
    outs = []
    for i in range(8):
        carry, y = istft_stream(carry, Y_off[i * 8 : (i + 1) * 8], cfg)
        outs.append(y)
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(y_off), atol=1e-10)


def test_round_trip_reconstruction():
    """sqrt-Hann with 50% overlap satisfies COLA: synthesis(analysis(x))
    reconstructs x delayed by `overlap` samples (the streaming latency of the
    fresh-stream zero-prefix)."""
    cfg = StftConfig(256, 128)
    x = _rand(128 * 40, seed=7)
    y = np.asarray(synthesis(analysis(jnp.asarray(x), cfg), cfg))
    assert y.shape == x.shape
    np.testing.assert_allclose(y[cfg.overlap :], x[: len(y) - cfg.overlap], atol=1e-8)


def test_batched_leading_axes():
    cfg = StftConfig(256, 128)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((3, 2, 128 * 16)))
    Y = analysis(x, cfg)
    assert Y.shape == (3, 2, 16, cfg.half_bin)
    for i in range(3):
        for j in range(2):
            np.testing.assert_allclose(np.asarray(Y[i, j]), np.asarray(analysis(x[i, j], cfg)), atol=1e-12)
