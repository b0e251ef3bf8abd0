"""Interpreter-mode exactness test for the fused Pallas MVDR kernel."""

import numpy as np
import jax
import jax.numpy as jnp

from distantspeech_tpu.ops.pallas_mvdr import pallas_mvdr_scan
from distantspeech_tpu.stats.linalg import gauss_jordan_inv
from distantspeech_tpu.stats.weights import mvdr_weights


def _jnp_reference(Z, gate, steer, alpha_v=0.9998, diag=1e-6):
    """The mvdr_step recursion with an externally-supplied gate."""
    T, B, F, M = Z.shape
    eye = jnp.eye(M, dtype=Z.dtype)

    def step(carry, inp):
        Rvv, Rinv = carry
        z, g = inp
        cand = alpha_v * Rvv + (1 - alpha_v) * z[..., :, None] * jnp.conj(z)[..., None, :]
        inv_cand = gauss_jordan_inv(cand + diag * eye)
        gm = g[..., None, None] > 0.5
        Rvv = jnp.where(gm, cand, Rvv)
        Rinv = jnp.where(gm, inv_cand, Rinv)
        w = mvdr_weights(steer.astype(Z.dtype), Rinv)
        y = jnp.einsum("...fm,...fm->...f", jnp.conj(w), z)
        return (Rvv, Rinv), y

    z0 = jnp.zeros((B, F, M, M), dtype=Z.dtype)
    _, Y = jax.lax.scan(step, (z0, z0), (Z, gate))
    return Y


def test_pallas_mvdr_matches_scan():
    rng = np.random.default_rng(0)
    T, B, F, M = 12, 2, 5, 4
    Z = (rng.standard_normal((T, B, F, M)) + 1j * rng.standard_normal((T, B, F, M))).astype(np.complex64)
    gate = (rng.uniform(size=(T, B, F)) > 0.3).astype(np.float32)
    steer = np.exp(1j * rng.uniform(0, 2 * np.pi, (F, M))).astype(np.complex64)

    want = np.asarray(_jnp_reference(jnp.asarray(Z), jnp.asarray(gate), jnp.asarray(steer)))
    got = np.asarray(
        pallas_mvdr_scan(jnp.asarray(Z), jnp.asarray(gate), jnp.asarray(steer), f_tile=8, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pallas_mvdr_t_chunking():
    """T not divisible by t_chunk: padded frames must not perturb real ones,
    and the carry must persist across chunk boundaries."""
    rng = np.random.default_rng(1)
    T, B, F, M = 23, 3, 5, 4
    Z = (rng.standard_normal((T, B, F, M)) + 1j * rng.standard_normal((T, B, F, M))).astype(np.complex64)
    gate = (rng.uniform(size=(T, B, F)) > 0.3).astype(np.float32)
    gate[0] = 1.0
    steer = np.exp(1j * rng.uniform(0, 2 * np.pi, (F, M))).astype(np.complex64)

    want = np.asarray(_jnp_reference(jnp.asarray(Z), jnp.asarray(gate), jnp.asarray(steer)))
    got = np.asarray(
        pallas_mvdr_scan(
            jnp.asarray(Z), jnp.asarray(gate), jnp.asarray(steer), f_tile=8, t_chunk=8, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_enhance_pallas_backend_matches_scan():
    """Full fast path (MCRA pre-scan + Pallas kernel + OM-LSA scan) against
    the fused enhance_scan reference."""
    from distantspeech_tpu.beamform.enhance import (
        EnhanceConfig, enhance_init, enhance_scan, enhance_scan_pallas,
    )

    rng = np.random.default_rng(2)
    T, B, M = 40, 2, 4
    cfg = EnhanceConfig()
    F = cfg.stft.half_bin
    Z = (rng.standard_normal((T, B, F, M)) + 1j * rng.standard_normal((T, B, F, M))).astype(np.complex64)
    steer = np.exp(1j * rng.uniform(0, 2 * np.pi, (F, M))).astype(np.complex64)

    state = enhance_init(cfg, M, batch_shape=(B,), cdtype=jnp.complex64)
    _, want = enhance_scan(cfg, jnp.asarray(steer), state, jnp.asarray(Z))
    got = enhance_scan_pallas(cfg, jnp.asarray(steer), jnp.asarray(Z), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4)


def test_enhance_pallas_rel_diag_matches_scan():
    """MvdrConfig.rel_diag (relative diagonal loading, the complex64
    production guard) must be honoured by the fused kernel, not silently
    dropped (round-1 advisor finding)."""
    from distantspeech_tpu.beamform.enhance import (
        EnhanceConfig, enhance_init, enhance_scan, enhance_scan_pallas,
    )
    from distantspeech_tpu.beamform.mvdr import MvdrConfig

    rng = np.random.default_rng(3)
    T, B, M = 40, 2, 4
    # large rel_diag so a silent drop is far outside the tolerance
    cfg = EnhanceConfig(mvdr=MvdrConfig(mcra_L=65, rel_diag=0.05))
    F = cfg.stft.half_bin
    Z = (rng.standard_normal((T, B, F, M)) + 1j * rng.standard_normal((T, B, F, M))).astype(np.complex64)
    steer = np.exp(1j * rng.uniform(0, 2 * np.pi, (F, M))).astype(np.complex64)

    state = enhance_init(cfg, M, batch_shape=(B,), cdtype=jnp.complex64)
    _, want = enhance_scan(cfg, jnp.asarray(steer), state, jnp.asarray(Z))
    got = enhance_scan_pallas(cfg, jnp.asarray(steer), jnp.asarray(Z), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4)

    # and the result must actually differ from the unloaded kernel
    cfg0 = EnhanceConfig(mvdr=MvdrConfig(mcra_L=65))
    got0 = enhance_scan_pallas(cfg0, jnp.asarray(steer), jnp.asarray(Z), interpret=True)
    assert np.max(np.abs(np.asarray(got0) - np.asarray(got))) > 1e-4


def test_pallas_mvdr_api_validation():
    import pytest

    from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_scan_pallas

    Z = jnp.zeros((4, 2, 5, 3), dtype=jnp.complex64)
    g = jnp.ones((4, 2, 5), dtype=jnp.float32)
    a = jnp.ones((5, 3), dtype=jnp.complex64)
    with pytest.raises(ValueError, match="BOTH p and lam"):
        pallas_mvdr_scan(Z, g, a, p=g, interpret=True)
    with pytest.raises(ValueError, match="BOTH p and lam"):
        pallas_mvdr_scan(Z, g, a, lam=g, interpret=True)
    with pytest.raises(ValueError, match="4-D"):
        pallas_mvdr_scan(Z[:, 0], g[:, 0], a, interpret=True)
    with pytest.raises(ValueError, match="T, B, F, M"):
        enhance_scan_pallas(EnhanceConfig(), a, Z[:, 0], interpret=True)
