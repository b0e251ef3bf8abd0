"""Parity tests for the Nyquist(M) subband filterbank vs. the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

import refutil
from distantspeech_tpu.transform import (
    SubbandConfig,
    design_analysis_prototype,
    design_synthesis_prototype,
    subband_analysis,
    subband_analysis_stream,
    subband_synthesis,
)


def _ref_subband(n_fft, hop, channel=1):
    mod = refutil.load("DistantSpeech.transform.subband")
    return mod.Subband(n_fft=n_fft, hop_length=hop, channel=channel)


def test_design_parity():
    dn = refutil.load("DistantSpeech.transform.design_nyquist_filter")
    M, m, D = 32, 2, 16
    h_ref, beta_ref = dn.design_Nyquist_analyasis_filter_prototype(M, m, D)
    g_ref, eps_ref = dn.design_Nyquist_synthesis_filter_prototype(h_ref, M, m, D)
    h, beta = design_analysis_prototype(M, m, D)
    g, eps = design_synthesis_prototype(h, M, m, D)
    np.testing.assert_allclose(h, h_ref, atol=1e-12)
    np.testing.assert_allclose(g, g_ref, atol=1e-10)
    np.testing.assert_allclose(beta, float(beta_ref), rtol=1e-6)


def test_analysis_parity_multichannel():
    n_fft, hop, C = 64, 32, 3
    rng = np.random.default_rng(0)
    x = rng.standard_normal((hop * 20, C))

    ref = _ref_subband(n_fft, hop, channel=C)
    Y_ref = ref.analysis(x)  # [half_bin, T, C]

    cfg = SubbandConfig(n_fft=n_fft, hop=hop)
    Y = subband_analysis(jnp.asarray(x.T), cfg)  # [C, T, F]
    np.testing.assert_allclose(np.asarray(Y).transpose(2, 1, 0), Y_ref, rtol=1e-9, atol=1e-11)


def test_synthesis_parity_streaming():
    n_fft, hop = 64, 32
    rng = np.random.default_rng(1)
    x = rng.standard_normal(hop * 30)

    ref = _ref_subband(n_fft, hop)
    cfg = SubbandConfig(n_fft=n_fft, hop=hop)

    # stream chunk-by-chunk through analysis+synthesis on both sides
    h = jnp.asarray(cfg.prototypes()[0])
    from distantspeech_tpu.transform import subband_synthesis_init, subband_synthesis_step

    carry = jnp.zeros(cfg.overlap, dtype=jnp.float64)
    tdl = subband_synthesis_init((), cfg, dtype=jnp.float64)
    g = jnp.asarray(cfg.prototypes()[1])

    for i in range(0, len(x), hop):
        chunk = x[i : i + hop]
        Y_ref = ref.analysis(chunk)  # [F, 1]? squeezed -> [F]
        y_ref = ref.synthesis(Y_ref)

        carry, Y = subband_analysis_stream(carry, jnp.asarray(chunk), cfg, h)
        tdl, y = subband_synthesis_step(tdl, Y[0], cfg, g)
        np.testing.assert_allclose(np.asarray(Y[0]), np.squeeze(Y_ref), rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-8, atol=1e-10)


def test_offline_roundtrip_reconstruction():
    """Perfect-reconstruction quality: output matches delayed input closely."""
    n_fft, hop = 64, 32
    cfg = SubbandConfig(n_fft=n_fft, hop=hop)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(hop * 100)
    Y = subband_analysis(jnp.asarray(x), cfg)
    y = np.asarray(subband_synthesis(Y, cfg))
    # total filterbank delay is win_len - hop samples (96 for M=64, m=2, hop=32)
    best = max(
        np.corrcoef(x[: len(y) - s], y[s:])[0, 1] for s in range(0, 2 * cfg.win_len)
    )
    assert best > 0.999, f"reconstruction correlation {best}"


def test_offline_matches_streaming():
    n_fft, hop = 64, 32
    cfg = SubbandConfig(n_fft=n_fft, hop=hop)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(hop * 12)
    Y_off = np.asarray(subband_analysis(jnp.asarray(x), cfg))
    h = jnp.asarray(cfg.prototypes()[0])
    carry = jnp.zeros(cfg.overlap, dtype=jnp.float64)
    outs = []
    for i in range(0, len(x), hop * 3):
        carry, Y = subband_analysis_stream(carry, jnp.asarray(x[i : i + hop * 3]), cfg, h)
        outs.append(np.asarray(Y))
    np.testing.assert_allclose(np.concatenate(outs, axis=0), Y_off, rtol=1e-10, atol=1e-12)
