"""Parity test for the dual-mic KWS cleaner."""

import numpy as np
import jax.numpy as jnp

import refutil
from distantspeech_tpu.kws import DualMicKwsConfig, kws_process


def test_dual_mic_kws_parity():
    refutil.patch_beamformer_base()
    ma_mod = refutil.load("DistantSpeech.beamformer.MicArray")
    kws_mod = refutil.load("DistantSpeech.kws.dual_mic_kws")
    mic = ma_mod.MicArray(arrayType="linear", r=0.04, M=2)
    ref = kws_mod.DualMicKws(mic, frameLen=256)

    rng = np.random.default_rng(0)
    S = 256 * 30
    src = rng.standard_normal(S)
    x = np.stack([src, np.roll(src, 3) * 0.8 + 0.1 * rng.standard_normal(S)], axis=0)

    out_ref = ref.process(x)

    out = np.asarray(kws_process(jnp.asarray(x), DualMicKwsConfig(frame_len=256)))
    np.testing.assert_allclose(out, out_ref, rtol=1e-7, atol=1e-9)


def test_kws_cleaner_preserves_late_target():
    """Functional: a keyword arriving after the defer window is NOT cancelled
    while steady interference is."""
    cfg = DualMicKwsConfig(frame_len=256, defer_seconds=0.5)
    rng = np.random.default_rng(1)
    S = 256 * 80
    interf = rng.standard_normal(S)
    x0 = interf.copy()
    x1 = np.roll(interf, 2) * 0.9
    # keyword burst near the end on mic1 only path difference
    kw = np.zeros(S)
    k0 = S - 256 * 12
    kw[k0 : k0 + 256 * 8] = rng.standard_normal(256 * 8)
    x1k = x1 + kw
    out = np.asarray(kws_process(jnp.asarray(np.stack([x0, x1k])), cfg))
    # interference region (pre-keyword, post-convergence) should be suppressed
    pre = slice(256 * 40, 256 * 60)
    kwr = slice(k0, k0 + 256 * 8)
    supp = np.mean(out[pre] ** 2) / np.mean(x1[pre] ** 2)
    keep = np.mean(out[kwr] ** 2) / np.mean(kw[kwr] ** 2)
    assert supp < 0.08, supp  # ~ -11 dB with the deferred filter lag
    assert keep > 0.5, keep
