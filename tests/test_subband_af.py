"""Parity tests for subband adaptive filters and WPE."""

import numpy as np
import jax.numpy as jnp

import refutil
from distantspeech_tpu.adaptive.subband import (
    SubbandAfConfig,
    subband_lms_init,
    subband_lms_mc_step,
    subband_lms_step,
    subband_rls_init,
    subband_rls_step,
)
from distantspeech_tpu.derev import WpeConfig, wpe_process, wpe_run


def _cplx(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_subband_lms_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.SubbandLMS")
    nb, N, T = 64, 3, 60
    F = nb // 2 + 1
    x = _cplx((T, F), 0)
    d = _cplx((T, F), 1)
    p = np.random.default_rng(2).uniform(0.1, 1.0, size=F)

    ref = mod.SubbandLMS(filter_len=N, num_bands=nb, mu=0.05)
    err_ref = np.zeros((T, F), dtype=complex)
    for t in range(T):
        err_ref[t], _ = ref.update(x[t], d[t], p=p)

    cfg = SubbandAfConfig(num_bands=nb, filter_len=N, mu=0.05)
    st = subband_lms_init(cfg, cdtype=jnp.complex128)
    err = np.zeros((T, F), dtype=complex)
    for t in range(T):
        st, e = subband_lms_step(cfg, st, jnp.asarray(x[t]), jnp.asarray(d[t]), p=jnp.asarray(p))
        err[t] = np.asarray(e)
    np.testing.assert_allclose(err, err_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(st.W), ref.W, rtol=1e-9, atol=1e-11)


def test_subband_lms_mc_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.SubbandLmsMc")
    nb, N, C, T = 64, 2, 3, 50
    F = nb // 2 + 1
    x = _cplx((T, F, C), 3)
    d = _cplx((T, F), 4)
    p = np.random.default_rng(5).uniform(0.1, 1.0, size=(F, 1))

    ref = mod.SubbandLmsMc(filter_len=N, num_bands=nb, channel=C, mu=0.05)
    err_ref = np.zeros((T, F), dtype=complex)
    for t in range(T):
        # reference TD/FD dispatch keys on float dtype; complex passes through
        e, _ = ref.update(x[t][:, None, :], d[t], p=p)
        err_ref[t] = e

    cfg = SubbandAfConfig(num_bands=nb, filter_len=N, n_channels=C, mu=0.05)
    st = subband_lms_init(cfg, cdtype=jnp.complex128)
    err = np.zeros((T, F), dtype=complex)
    for t in range(T):
        st, e = subband_lms_mc_step(cfg, st, jnp.asarray(x[t]), jnp.asarray(d[t]), p=jnp.asarray(p[:, 0]))
        err[t] = np.asarray(e)
    np.testing.assert_allclose(err, err_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(st.W), ref.W.transpose(0, 1, 2), rtol=1e-9, atol=1e-11)


def test_subband_rls_parity():
    mod = refutil.load("DistantSpeech.adaptivefilter.SubbandRLS")
    nb, N, T = 64, 2, 50
    F = nb // 2 + 1
    x = _cplx((T, F), 6)
    d = _cplx((T, F), 7)

    ref = mod.SubbandRLS(filter_len=N, num_bands=nb)
    err_ref = np.zeros((T, F), dtype=complex)
    for t in range(T):
        err_ref[t], _ = ref.update(x[t], d[t])

    cfg = SubbandAfConfig(num_bands=nb, filter_len=N)
    st = subband_rls_init(cfg, cdtype=jnp.complex128)
    err = np.zeros((T, F), dtype=complex)
    for t in range(T):
        st, e = subband_rls_step(cfg, st, jnp.asarray(x[t]), jnp.asarray(d[t]))
        err[t] = np.asarray(e)
    np.testing.assert_allclose(err, err_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.W), ref.W, rtol=1e-8, atol=1e-10)


def test_wpe_matches_reference():
    """End-to-end parity against the reference Wpe module itself
    (awpe.py:129-196; its missing ``check_input_data`` helper is restored by
    refutil.patch_wpe): per-hop time-domain drive, comparing the final
    prediction filters W frame-exactly and the synthesized time-domain
    output of the dereverberated reference channel."""
    awpe = refutil.patch_wpe()

    C, N, delay = 2, 2, 2
    num_bands, hop = 64, 32
    cfg = WpeConfig(num_bands=num_bands, hop=hop, n_channels=C, filter_len=N, delay=delay)
    T = 60
    rng = np.random.default_rng(8)
    x = rng.standard_normal((T * hop, C)) * 0.3

    ref = awpe.Wpe(channels=C, filter_len=N, num_bands=num_bands, delay=delay, hop_length=hop)
    outs = []
    for n in range(T):
        out, W_ref = ref.update(x[n * hop : (n + 1) * hop])
        outs.append(out)
    y_ref = np.concatenate(outs)

    y_ours = np.asarray(wpe_process(jnp.asarray(x.T), cfg))
    np.testing.assert_allclose(y_ours[: len(y_ref)], y_ref, rtol=1e-8, atol=1e-10)

    # final prediction filters must match too (the full recursion state)
    from distantspeech_tpu.derev.wpe import wpe_init, wpe_step
    from distantspeech_tpu.transform.subband import subband_analysis

    Y = subband_analysis(jnp.asarray(x.T), cfg.subband)  # [C, T, F]
    D_tf = jnp.moveaxis(jnp.moveaxis(Y, -3, -1), -3, 0)
    delayed = jnp.concatenate([jnp.zeros_like(D_tf[:delay]), D_tf[:-delay]], axis=0)
    state = wpe_init(cfg, cdtype=jnp.complex128)
    import jax

    state, _ = jax.lax.scan(lambda s, dd: wpe_step(cfg, s, dd[0], dd[1]), state, (D_tf, delayed))
    np.testing.assert_allclose(np.asarray(state.W), W_ref, rtol=1e-8, atol=1e-10)


def test_wpe_reduces_late_reverb():
    """Functional: synthetic exponential reverb tail, WPE should raise DRR."""
    cfg = WpeConfig(num_bands=64, hop=32, n_channels=2, filter_len=3, delay=1)
    rng = np.random.default_rng(9)
    S = 32 * 400
    dry = rng.standard_normal(S) * (rng.uniform(size=S) > 0.6)
    rir_len = 400
    rirs = []
    for ch in range(2):
        rir = rng.standard_normal(rir_len) * np.exp(-np.arange(rir_len) / 60.0)
        rir[0] = 1.0
        rirs.append(rir)
    wet = np.stack([np.convolve(dry, r)[:S] for r in rirs], axis=0)

    out = np.asarray(wpe_process(jnp.asarray(wet), cfg))
    # compare tail energy in silence gaps after the filter has converged
    ref_ch = wet[0]
    n0 = S // 2
    resid_in = np.sum((ref_ch[n0:] - dry[n0:]) ** 2)
    # align: subband round-trip delays by win_len - hop samples
    d = cfg.subband.win_len - cfg.hop
    est = out[n0 + d : S]
    tgt = dry[n0 : S - d]
    resid_out = np.sum((est / np.max(np.abs(est)) * np.max(np.abs(dry)) - tgt) ** 2)
    assert np.isfinite(out).all()
    assert resid_out < resid_in, (resid_out, resid_in)
