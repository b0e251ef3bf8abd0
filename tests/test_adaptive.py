"""Parity tests for time/frequency-domain adaptive filters vs. the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.adaptive import (
    FlmsConfig,
    block_lms_init,
    block_lms_step,
    dc_notch,
    dc_notch_init,
    de_emphasis,
    emphasis_init,
    flms_init,
    flms_step,
    nlms_filter,
    pre_emphasis,
    rls_filter,
)


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n)


def test_nlms_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.BaseFilter")
    x, d = _sig(400, 0), _sig(400, 1)
    ref = mod.BaseFilter(filter_len=16, mu=0.1)
    err_ref = np.array([ref.update(x[n], d[n])[0].item() for n in range(len(x))])
    err, w = nlms_filter(jnp.asarray(x), jnp.asarray(d), 16, mu=0.1)
    np.testing.assert_allclose(np.asarray(err), err_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(w), np.squeeze(ref.w), rtol=1e-9, atol=1e-12)


def test_lms_unnormalized_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.BaseFilter")
    x, d = _sig(300, 2) * 0.3, _sig(300, 3) * 0.3
    ref = mod.BaseFilter(filter_len=8, mu=0.01, normalization=False)
    err_ref = np.array([ref.update(x[n], d[n])[0].item() for n in range(len(x))])
    err, _ = nlms_filter(jnp.asarray(x), jnp.asarray(d), 8, mu=0.01, normalize=False)
    np.testing.assert_allclose(np.asarray(err), err_ref, rtol=1e-9, atol=1e-12)


def test_block_lms_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.BlockLMS")
    x, d = _sig(300, 4), _sig(300, 5)
    ref = mod.BlockLms(block_len=4, filter_len=12, mu=0.05)
    err_ref = np.array([ref.update(x[n], d[n])[0].item() for n in range(len(x))])

    state = block_lms_init(12, 4, dtype=jnp.float64)
    errs = []
    for n in range(len(x)):
        state, e = block_lms_step(state, jnp.asarray(x[n]), jnp.asarray(d[n]), mu=0.05)
        errs.append(float(e))
    np.testing.assert_allclose(np.asarray(errs), err_ref, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(state.w), np.squeeze(ref.w), rtol=1e-8, atol=1e-11)


def test_rls_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.RLS")
    x, d = _sig(200, 6), _sig(200, 7)
    ref = mod.Rls(filter_len=8)
    err_ref = np.array([ref.update(x[n], d[n])[0].item() for n in range(len(x))])
    err, w = rls_filter(jnp.asarray(x), jnp.asarray(d), 8)
    np.testing.assert_allclose(np.asarray(err), err_ref, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(w), np.squeeze(ref.w), rtol=1e-7, atol=1e-10)


def test_emphasis_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.feature")
    x = _sig(1000, 8)
    ref = mod.Emphasis()
    pre_ref = ref.pre_emphsis(x)
    de_ref = ref.de_emphsis(pre_ref)

    st = emphasis_init(dtype=jnp.float64)
    # chunked to exercise the streaming carry
    pre = np.zeros_like(x)
    de = np.zeros_like(x)
    for i in range(0, 1000, 250):
        st, y = pre_emphasis(st, jnp.asarray(x[i : i + 250]))
        pre[i : i + 250] = np.asarray(y)
    for i in range(0, 1000, 250):
        st, y = de_emphasis(st, jnp.asarray(pre[i : i + 250]))
        de[i : i + 250] = np.asarray(y)
    np.testing.assert_allclose(pre, pre_ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(de, de_ref, rtol=1e-8, atol=1e-10)


def test_dc_notch_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.feature")
    x = _sig(800, 9)
    ref = mod.FilterDcNotch16()
    out_ref, _ = ref.filter_dc_notch16(x)

    st = dc_notch_init(dtype=jnp.float64)
    out = np.zeros_like(x)
    for i in range(0, 800, 160):
        st, y = dc_notch(st, jnp.asarray(x[i : i + 160]))
        out[i : i + 160] = np.asarray(y)
    np.testing.assert_allclose(out, out_ref, rtol=1e-8, atol=1e-10)


def _run_ref_flms(ref, x, d, hop, **kw):
    n_blocks = len(d) // hop
    errs = np.zeros((n_blocks, hop))
    for b in range(n_blocks):
        xb = x[..., b * hop : (b + 1) * hop]
        e, w = ref.update(xb.T if xb.ndim == 2 else xb, d[b * hop : (b + 1) * hop], **kw)
        errs[b] = np.squeeze(e)
    return errs, np.asarray(ref.w)


def _run_jax_flms(cfg, x, d, **kw):
    state = flms_init(cfg, dtype=jnp.float64)
    hop = cfg.hop
    n_blocks = d.shape[-1] // hop
    errs = np.zeros((n_blocks, hop))
    for b in range(n_blocks):
        xb = x[..., b * hop : (b + 1) * hop]
        if xb.ndim == 1:
            xb = xb[None, :]
        state, (e, w) = flms_step(cfg, state, jnp.asarray(xb), jnp.asarray(d[b * hop : (b + 1) * hop]), **kw)
        errs[b] = np.asarray(e)
    return errs, np.asarray(w)


@pytest.mark.parametrize("constrain", [True, False])
def test_flms_parity_single_channel(constrain):
    mod = refutil.load("DistantSpeech.adaptivefilter.FastFreqLms")
    L = 64
    rng = np.random.default_rng(10)
    x = rng.standard_normal(L * 12)
    h = rng.standard_normal(L // 2) * np.exp(-np.arange(L // 2) / 8)
    d = np.convolve(x, h)[: len(x)]

    ref = mod.FastFreqLms(filter_len=L, mu=0.05, constrain=constrain)
    err_ref, w_ref = _run_ref_flms(ref, x, d, L)

    cfg = FlmsConfig(filter_len=L, mu=0.05, constrain=constrain)
    err, w = _run_jax_flms(cfg, x, d)
    np.testing.assert_allclose(err, err_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(w[0], np.squeeze(w_ref), rtol=1e-8, atol=1e-10)


def test_flms_parity_multichannel_vector_p():
    mod = refutil.load("DistantSpeech.adaptivefilter.FastFreqLms")
    L, C = 32, 3
    rng = np.random.default_rng(11)
    x = rng.standard_normal((C, L * 10))
    d = rng.standard_normal(L * 10) * 0.1 + x.sum(0) * 0.2
    p_vec = rng.uniform(0.2, 1.0, size=(FlmsConfig(filter_len=L).half_bin, 1))

    ref = mod.FastFreqLms(filter_len=L, mu=0.02, n_channels=C)
    err_ref, w_ref = _run_ref_flms(ref, x, d, L, p=p_vec)

    cfg = FlmsConfig(filter_len=L, mu=0.02, n_channels=C)
    err, w = _run_jax_flms(cfg, x, d, p=jnp.asarray(p_vec[:, 0]))
    np.testing.assert_allclose(err, err_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(w, w_ref.T, rtol=1e-8, atol=1e-10)


def test_flms_parity_non_causal_truncate():
    mod = refutil.load("DistantSpeech.adaptivefilter.FastFreqLms")
    L = 32
    rng = np.random.default_rng(12)
    x = rng.standard_normal(L * 10)
    d = rng.standard_normal(L * 10)

    ref = mod.FastFreqLms(filter_len=L, mu=0.05, non_causal=True)
    err_ref, w_ref = _run_ref_flms(ref, x, d, L, fir_truncate=3)

    cfg = FlmsConfig(filter_len=L, mu=0.05, non_causal=True)
    err, w = _run_jax_flms(cfg, x, d, fir_truncate=3)
    np.testing.assert_allclose(err, err_ref, rtol=1e-8, atol=1e-10)


def test_flms_parity_two_path():
    mod = refutil.load("DistantSpeech.adaptivefilter.FastFreqLms")
    L = 32
    rng = np.random.default_rng(13)
    x = rng.standard_normal(L * 14)
    h = rng.standard_normal(8)
    d = np.convolve(x, h)[: len(x)]

    ref = mod.FastFreqLms(filter_len=L, mu=0.1, two_path=True)
    err_ref, _ = _run_ref_flms(ref, x, d, L)

    cfg = FlmsConfig(filter_len=L, mu=0.1, two_path=True)
    err, _ = _run_jax_flms(cfg, x, d)
    np.testing.assert_allclose(err, err_ref, rtol=1e-8, atol=1e-10)
