"""Tests for the CLI driver and streaming-state checkpointing."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from distantspeech_tpu.runtime.checkpoint import load_state, save_state
from distantspeech_tpu.runtime.cli import build_parser, run
from distantspeech_tpu.runtime.io import save_audio


@pytest.mark.parametrize(
    "pipeline",
    ["fixed_ds", "mvdr", "enhance", "pmwf", "tdgsc", "dios_gsc", "mccowan", "binaural"],
)
def test_cli_pipelines(pipeline):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256 * 12, 4)) * 0.1
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.wav")
        outp = os.path.join(d, "out.wav")
        save_audio(inp, x)
        args = build_parser().parse_args([inp, outp, "--pipeline", pipeline, "--array", "circular"])
        y = run(args)
        assert np.isfinite(y).all() and os.path.exists(outp)


def test_checkpoint_roundtrip_resumes_stream():
    """Save mid-stream MVDR state, restore into a fresh template, outputs match."""
    from distantspeech_tpu.beamform.mvdr import MvdrConfig, mvdr_init, mvdr_step
    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.array.steering import steering_vector

    cfg = MvdrConfig()
    geom = ArrayGeometry.linear(4, 0.032)
    steer = jnp.asarray(steering_vector(geom, (np.pi / 2, 0), 256), dtype=jnp.complex128)
    rng = np.random.default_rng(1)
    Z = rng.standard_normal((20, 129, 4)) + 1j * rng.standard_normal((20, 129, 4))

    state = mvdr_init(cfg, 4, cdtype=jnp.complex128)
    for t in range(10):
        state, _ = mvdr_step(cfg, steer, state, jnp.asarray(Z[t]))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, state)
        restored = load_state(path, mvdr_init(cfg, 4, cdtype=jnp.complex128))

    for t in range(10, 20):
        state, y1 = mvdr_step(cfg, steer, state, jnp.asarray(Z[t]))
        restored, y2 = mvdr_step(cfg, steer, restored, jnp.asarray(Z[t]))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-12)
