"""Integration test for the composed AEC + GSC + postfilter + KWS stack."""

import numpy as np
import jax.numpy as jnp

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.runtime.full_stack import FullStackConfig, full_stack_process
from distantspeech_tpu.adaptive.aec import AecConfig


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
