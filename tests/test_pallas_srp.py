"""Fused SRP-PHAT kernel vs the XLA einsum path (interpret mode).

The scan path is parity-tested against the reference
(tests/test_doa_postfilter.py), so scan-vs-fused closes the chain to
srp.compute_angle_spectrum (/root/reference/DistantSpeech/doa/srp.py:17-53)."""

import numpy as np
import jax.numpy as jnp

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.doa.srp import SrpConfig, srp_process, srp_steering_grid
from distantspeech_tpu.ops.pallas_srp import fused_srp_spectrum


def test_fused_srp_matches_scan():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 16000)).astype(np.float32))
    geom = ArrayGeometry.linear(8, 0.032)
    s1, p1 = srp_process(x, geom)
    s2, p2 = srp_process(x, geom, backend="fused")
    s1, s2 = np.asarray(s1), np.asarray(s2)
    rel = np.max(np.abs(s1 - s2)) / (np.max(np.abs(s1)) + 1e-12)
    assert rel < 1e-5
    assert (s1.argmax(-1) == s2.argmax(-1)).all()  # identical DOA picks
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_fused_srp_row_padding_and_no_batch():
    """Row padding (T*B not a multiple of the row tile) and the unbatched
    [M, S] path both reduce to the same spectra."""
    rng = np.random.default_rng(1)
    geom = ArrayGeometry.linear(4, 0.05)
    cfg = SrpConfig()
    x = jnp.asarray(rng.standard_normal((4, 6400)).astype(np.float32))  # T=49: pads
    s1 = np.asarray(srp_process(x, geom, cfg)[0])
    s2 = np.asarray(srp_process(x, geom, cfg, backend="fused")[0])
    rel = np.max(np.abs(s1 - s2)) / (np.max(np.abs(s1)) + 1e-12)
    assert rel < 1e-5


def test_fused_srp_no_phat():
    rng = np.random.default_rng(2)
    geom = ArrayGeometry.linear(4, 0.032)
    grid = srp_steering_grid(SrpConfig(), geom)
    Y = jnp.asarray((rng.standard_normal((7, 129, 4)) + 1j * rng.standard_normal((7, 129, 4))).astype(np.complex64))
    from distantspeech_tpu.doa.srp import srp_angle_spectrum

    s1 = np.asarray(srp_angle_spectrum(Y, jnp.asarray(grid), phat=False))
    s2 = np.asarray(fused_srp_spectrum(Y, grid, phat=False, interpret=True))
    rel = np.max(np.abs(s1 - s2)) / (np.max(np.abs(s1)) + 1e-12)
    assert rel < 1e-5
