"""Parity tests for MDF and the speex-style AEC vs. the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.adaptive import (
    AecConfig,
    MdfConfig,
    aec_init,
    aec_step,
    mdf_init,
    mdf_step,
)


def _echo_scene(n_blocks, block_len, seed=0):
    rng = np.random.default_rng(seed)
    S = n_blocks * block_len
    x = rng.standard_normal(S)  # far end
    h = rng.standard_normal(48) * np.exp(-np.arange(48) / 12)
    near = 0.1 * rng.standard_normal(S)
    d = np.convolve(x, h)[:S] + near  # mic = echo + near-end noise
    return x, d


@pytest.mark.parametrize("num_block,prop", [(1, False), (2, False), (2, True), (4, True)])
def test_mdf_parity(num_block, prop):
    mod = refutil.load("DistantSpeech.adaptivefilter.mdf")
    filter_len = 64
    block_len = filter_len // num_block
    x, d = _echo_scene(24, block_len, seed=num_block)

    ref = mod.Mdf(filter_len=filter_len, mu=0.05, num_block=num_block, prop=prop)
    cfg = MdfConfig(filter_len=filter_len, mu=0.05, num_block=num_block, prop=prop)
    st = mdf_init(cfg, dtype=jnp.float64)

    for b in range(24):
        blk = slice(b * block_len, (b + 1) * block_len)
        e_ref, w_ref = ref.update(x[blk], d[blk])
        st, (e, w) = mdf_step(cfg, st, jnp.asarray(x[blk]), jnp.asarray(d[blk]))
        np.testing.assert_allclose(np.asarray(e), np.squeeze(e_ref), rtol=1e-8, atol=1e-10, err_msg=f"block {b}")
    np.testing.assert_allclose(np.asarray(w), np.squeeze(w_ref), rtol=1e-8, atol=1e-10)


def test_mdf_non_causal_constrain_off():
    mod = refutil.load("DistantSpeech.adaptivefilter.mdf")
    filter_len = 32
    x, d = _echo_scene(16, filter_len, seed=9)
    ref = mod.Mdf(filter_len=filter_len, mu=0.05, constrain=False, non_causal=True)
    cfg = MdfConfig(filter_len=filter_len, mu=0.05, constrain=False, non_causal=True)
    st = mdf_init(cfg, dtype=jnp.float64)
    for b in range(16):
        blk = slice(b * filter_len, (b + 1) * filter_len)
        e_ref, _ = ref.update(x[blk], d[blk])
        st, (e, _) = mdf_step(cfg, st, jnp.asarray(x[blk]), jnp.asarray(d[blk]))
        np.testing.assert_allclose(np.asarray(e), np.squeeze(e_ref), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("num_block,prop", [(1, True), (2, True), (2, False)])
def test_aec_parity(num_block, prop):
    mod = refutil.load("DistantSpeech.adaptivefilter.aec")
    filter_len = 64
    block_len = filter_len // num_block
    x, d = _echo_scene(30, block_len, seed=20 + num_block)

    ref = mod.Aec(filter_len=filter_len, mu=0.05, num_block=num_block, prop=prop, two_path=True)
    cfg = AecConfig(filter_len=filter_len, mu=0.05, num_block=num_block, prop=prop, two_path=True)
    st = aec_init(cfg, dtype=jnp.float64)

    for b in range(30):
        blk = slice(b * block_len, (b + 1) * block_len)
        out_ref, w_ref = ref.update(x[blk].copy(), d[blk].copy())
        st, (out, w) = aec_step(cfg, st, jnp.asarray(x[blk]), jnp.asarray(d[blk]))
        np.testing.assert_allclose(np.asarray(out), np.squeeze(out_ref), rtol=1e-7, atol=1e-9, err_msg=f"block {b}")
    np.testing.assert_allclose(np.asarray(w), np.squeeze(w_ref), rtol=1e-7, atol=1e-9)


def test_aec_cancels_echo():
    """Functional: echo-only scene, output energy should collapse."""
    cfg = AecConfig(filter_len=128, num_block=2)
    rng = np.random.default_rng(3)
    S = 64 * 80
    x = rng.standard_normal(S)
    h = rng.standard_normal(64) * np.exp(-np.arange(64) / 16)
    d = np.convolve(x, h)[:S]
    st = aec_init(cfg, dtype=jnp.float64)
    outs = []
    for b in range(S // cfg.block_len):
        blk = slice(b * cfg.block_len, (b + 1) * cfg.block_len)
        st, (out, _) = aec_step(cfg, st, jnp.asarray(x[blk]), jnp.asarray(d[blk]))
        outs.append(np.sum(np.asarray(out) ** 2))
    # speex's conservative mu_opt converges steadily but not fast: -16 dB here
    assert outs[-1] < 0.05 * max(outs[:5]), (outs[-1], max(outs[:5]))
