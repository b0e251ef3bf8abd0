"""Integration test for the composed AEC + GSC + postfilter + KWS stack."""

import numpy as np
import jax.numpy as jnp

import refutil
from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.runtime.full_stack import FullStackConfig, full_stack_process
from distantspeech_tpu.adaptive.aec import AecConfig


def test_full_stack_composed_reference_parity():
    """The whole stack against the REFERENCE classes wired identically:
    per-mic Aec (aec.py:227) -> DualMicKws tap on mics 0/1
    (dual_mic_kws.py:111) -> TDGSC with OMLSA postfilter (TDGSC.py:110,
    omlsa_multi.py:73).  Frame-exact composition, not just energy asserts."""
    refutil.patch_beamformer_base()
    ma_mod = refutil.load("DistantSpeech.beamformer.MicArray")
    aec_mod = refutil.load("DistantSpeech.adaptivefilter.aec")
    kws_mod = refutil.load("DistantSpeech.kws.dual_mic_kws")
    tdgsc_mod = refutil.load("DistantSpeech.beamformer.TDGSC")

    M, L, T = 4, 256, 16
    S = L * T
    rng = np.random.default_rng(5)
    far = rng.standard_normal(S) * 0.5
    h = rng.standard_normal(64) * np.exp(-np.arange(64) / 12)
    echo = np.convolve(far, h)[:S]
    x = (0.1 * rng.standard_normal((M, S)) + echo[None, :]).astype(np.float64)

    # ---- reference chain, wired exactly like runtime.full_stack ------------
    aecs = [
        aec_mod.Aec(filter_len=512, mu=0.01, num_block=2, prop=True, two_path=True)
        for _ in range(M)
    ]
    echo_free = np.zeros((S, M))
    for n in range(T):
        blk = slice(n * L, (n + 1) * L)
        for m in range(M):
            out_ref, _ = aecs[m].update(far[blk].copy(), x[m, blk].copy())
            echo_free[blk, m] = np.squeeze(out_ref)

    mic2 = ma_mod.MicArray(arrayType="linear", r=0.04, M=2)
    kws_ref = kws_mod.DualMicKws(mic2, frameLen=L)
    kws_out_ref = kws_ref.process(echo_free[:, :2].T.copy())

    mic = ma_mod.MicArray(arrayType="circular", r=0.032, M=M)
    tdgsc_ref = tdgsc_mod.TDGSC(mic, frameLen=L)
    out_ref, p_ref, _ = tdgsc_ref.process(echo_free.copy(), postfilter=True)

    # ---- ours ---------------------------------------------------------------
    geom = ArrayGeometry.circular(M, 0.032, c=343.0)
    cfg = FullStackConfig(
        n_mics=M, frame_len=L, aec=AecConfig(filter_len=512, num_block=2), postfilter=True
    )
    out, kws_clean, p = full_stack_process(jnp.asarray(x), jnp.asarray(far), geom, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-6, atol=2e-7)
    np.testing.assert_allclose(np.asarray(kws_clean), kws_out_ref, rtol=1e-6, atol=2e-7)
    np.testing.assert_allclose(np.asarray(p).swapaxes(-1, -2), p_ref, atol=1e-7)


def test_full_stack_runs_and_cancels_echo():
    rng = np.random.default_rng(0)
    M, L, T = 4, 256, 40
    S = L * T
    geom = ArrayGeometry.circular(M, 0.032)

    far = rng.standard_normal(S)  # loudspeaker signal
    h = rng.standard_normal(96) * np.exp(-np.arange(96) / 20)
    echo = np.convolve(far, h)[:S]
    near = 0.05 * rng.standard_normal((M, S))
    x = (near + echo[None, :]).astype(np.float64)

    cfg = FullStackConfig(n_mics=M, frame_len=L, aec=AecConfig(filter_len=512, num_block=2), postfilter=True)
    out, kws_clean, p = full_stack_process(jnp.asarray(x), jnp.asarray(far), geom, cfg=cfg)
    out = np.asarray(out)
    assert np.isfinite(out).all() and np.isfinite(np.asarray(kws_clean)).all()
    # echo energy must collapse in the second half (AEC converged)
    half = S // 2
    assert np.mean(out[half:] ** 2) < 0.1 * np.mean(echo[half:] ** 2)


def test_full_stack_batched():
    """Batched utterances share one compiled program."""
    rng = np.random.default_rng(1)
    B, M, L, T = 3, 4, 256, 10
    S = L * T
    geom = ArrayGeometry.circular(M, 0.032)
    x = rng.standard_normal((B, M, S)) * 0.2
    far = rng.standard_normal((B, S)) * 0.2
    cfg = FullStackConfig(n_mics=M, frame_len=L, aec=AecConfig(filter_len=512, num_block=2), postfilter=False)
    out, kws_clean, p = full_stack_process(jnp.asarray(x), jnp.asarray(far), geom, cfg=cfg)
    assert out.shape == (B, S) and kws_clean.shape == (B, S)
    # each batch element matches its solo run
    out0, _, _ = full_stack_process(jnp.asarray(x[0]), jnp.asarray(far[0]), geom, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out0), rtol=1e-10, atol=1e-12)
