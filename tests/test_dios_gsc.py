"""Parity tests for the dios_ssp (athena-signal) GSC ABM/AIC port."""

import numpy as np
import jax.numpy as jnp

import refutil
from distantspeech_tpu.beamform.dios_gsc import (
    DiosGscConfig,
    dios_abm_init,
    dios_abm_step,
    dios_aic_init,
    dios_aic_step,
)


def test_dios_abm_parity():
    refutil.restore_delayline()
    mod = refutil.load("DistantSpeech.beamformer.dios_ssp_gsc_abm")
    cfg = DiosGscConfig()
    ref = mod.objFGSCabm()

    rng = np.random.default_rng(0)
    n_seg = 120
    X = rng.standard_normal((n_seg, 4, cfg.seg))
    xref = rng.standard_normal((n_seg, cfg.seg)) * 0.5
    ctrl_abm = rng.uniform(0.0, 1.0, size=(n_seg, cfg.half_bin))
    ctrl_aic = rng.uniform(0.0, 1.0, size=(n_seg, cfg.half_bin))

    st = dios_abm_init(cfg)
    for n in range(n_seg):
        out_ref = mod.dios_ssp_gsc_gscabm_process(
            ref, X[n].copy(), xref[n].copy(), 0, ctrl_abm[n].copy(), ctrl_aic[n].copy()
        )
        st, out = dios_abm_step(
            cfg, st, jnp.asarray(X[n]), jnp.asarray(xref[n]), jnp.asarray(ctrl_abm[n]), jnp.asarray(ctrl_aic[n])
        )
        np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-8, atol=1e-10, err_msg=f"segment {n}")
    np.testing.assert_allclose(np.asarray(st.hf), ref.hf, rtol=1e-8, atol=1e-10)


def test_dios_process_pairing():
    """The pair-stepped offline driver (one ABM block per adaptation, round
    5) composes dios_abm_step/dios_aic_step bit-identically."""
    from distantspeech_tpu.array.alignment import time_alignment_filters
    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.beamform.dios_gsc import dios_gsc_process
    from distantspeech_tpu.ops.fir import fir_filter_block

    cfg = DiosGscConfig()
    geom = ArrayGeometry.linear(4, 0.032)
    coeffs = jnp.asarray(
        np.asarray(time_alignment_filters(geom, (np.pi / 2, 0.0)), dtype=np.float64))
    rng = np.random.default_rng(2)
    T = 40
    x = jnp.asarray(rng.standard_normal((4, T * cfg.seg)))

    out, bm = dios_gsc_process(x, coeffs, cfg)

    # reference composition: one segment at a time (the pre-round-5 driver)
    abm_st = dios_abm_init(cfg)
    aic_st = dios_aic_init(cfg)
    cache = jnp.zeros((4, coeffs.shape[-1] - 1), dtype=x.dtype)
    ones = jnp.ones(cfg.half_bin, dtype=x.dtype)
    outs = []
    for t in range(T):
        blk = x[..., t * cfg.seg : (t + 1) * cfg.seg]
        cache, aligned = fir_filter_block(cache, blk, coeffs)
        fbf = jnp.mean(aligned, axis=-2)
        abm_st, bm_seg = dios_abm_step(cfg, abm_st, aligned, fbf, ones, ones)
        aic_st, out_seg = dios_aic_step(
            cfg, aic_st, jnp.moveaxis(bm_seg, -1, -2), fbf, ones, ones)
        outs.append(np.asarray(out_seg))
    np.testing.assert_allclose(np.asarray(out), np.concatenate(outs), rtol=1e-12, atol=1e-14)


def test_dios_aic_parity():
    refutil.restore_delayline()
    mod = refutil.load("DistantSpeech.beamformer.dios_ssp_gsc_aic")
    cfg = DiosGscConfig()
    ref = mod.objFGSCaic()

    rng = np.random.default_rng(1)
    n_seg = 120
    X = rng.standard_normal((n_seg, 4, cfg.seg))
    xref = rng.standard_normal((n_seg, cfg.seg)) * 0.5
    ctrl_abm = rng.uniform(0.0, 1.0, size=(n_seg, cfg.half_bin))
    ctrl_aic = rng.uniform(0.0, 1.0, size=(n_seg, cfg.half_bin))

    st = dios_aic_init(cfg)
    for n in range(n_seg):
        out_ref = mod.dios_ssp_gsc_gscaic_process(
            ref, xref[n].copy(), X[n].copy(), 0, ctrl_abm[n].copy(), ctrl_aic[n].copy()
        )
        st, out = dios_aic_step(
            cfg, st, jnp.asarray(X[n]), jnp.asarray(xref[n]), jnp.asarray(ctrl_abm[n]), jnp.asarray(ctrl_aic[n])
        )
        np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-8, atol=1e-10, err_msg=f"segment {n}")
    np.testing.assert_allclose(np.asarray(st.Hf), ref.Hf[:, 0, :], rtol=1e-8, atol=1e-10)
