"""Multichannel OM-LSA postfilter (Cohen/Gannot/Berdugo 2003), vectorised.

Oracle: NsOmlsaMulti.estimation
(/root/reference/DistantSpeech/noise_estimation/omlsa_multi.py:73-160).
The transient-beam-to-reference-ratio (TBRR) postfilter behind the GSC
family: the fixed-beamformer power y and the M-1 blocking-matrix reference
powers u drive an a-priori absence probability q̂, an OM-LSA gain G, and an
SPP-weighted noise PSD.

Structure: the M per-channel MCRA noise trackers of the reference (one for
the beam, M-1 for the references, omlsa_multi.py:64-66) collapse into ONE
batched MCRA state with a leading channel axis — the per-frame step is a
single vectorised call.  All per-bin branching (Eq. 29 q̂ logic,
omlsa_multi.py:120-130) becomes ``jnp.where`` masks.

Reference quirks kept: frequency smoothing is zero-padded 3-tap convolve
(NoiseEstimationBase.smooth_psd:33-53); ``alpha_d = 0.85`` overrides the base
(omlsa_multi.py:57); the noise update uses ``beta = 1.47`` (:152); the first
frame only seeds state (:87-92) and computes no gain.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from distantspeech_tpu.noise.mcra import McraConfig, McraState, mcra_init, mcra_step


@dataclasses.dataclass(frozen=True)
class OmlsaConfig:
    nfft: int = 256
    n_channels: int = 4  # M: 1 beam + (M-1) references
    alpha_s: float = 0.8  # zeta smoothing (omlsa_multi.py:69)
    alpha_d: float = 0.85  # noise-psd pole (omlsa_multi.py:57)
    alpha_xi: float = 0.921  # decision-directed prior-SNR pole (:96)
    beta: float = 1.47  # noise-update overestimate (:152)
    Bmin: float = 1.66
    eps_tbrr: float = 0.01
    gamma_high: float = 10.0  # 0.1 * 10^2 (:117)
    gamma_low: float = 1.0
    omega_high: float = 3.0
    omega_low: float = 0.3
    q_min: float = 1e-6
    q_max: float = 0.9999998
    gmin_db: float = -12.0
    cal_weights: bool = True

    @property
    def half_bin(self) -> int:
        return self.nfft // 2 + 1

    @property
    def gmin(self) -> float:
        return 10.0 ** (self.gmin_db / 10.0)

    @property
    def mcra(self) -> McraConfig:
        return McraConfig(nfft=self.nfft)


class OmlsaState(NamedTuple):
    mcra: McraState  # batched [..., M, F] trackers (ch 0 = beam)
    zeta_Y: jnp.ndarray  # smoothed beam power      [..., F]
    zeta_U: jnp.ndarray  # smoothed reference power [..., M-1, F]
    lambda_d: jnp.ndarray  # noise PSD              [..., F]
    gamma: jnp.ndarray  # posterior SNR             [..., F]
    G_H1: jnp.ndarray  # H1 gain                    [..., F]
    G: jnp.ndarray  # OM-LSA gain                   [..., F]
    p: jnp.ndarray  # speech presence               [..., F]
    frm_cnt: jnp.ndarray  # scalar int32


def omlsa_init(cfg: OmlsaConfig, batch_shape=(), dtype=jnp.float32) -> OmlsaState:
    F, M = cfg.half_bin, cfg.n_channels
    z = jnp.zeros((*batch_shape, F), dtype=dtype)
    one = jnp.ones((*batch_shape, F), dtype=dtype)
    return OmlsaState(
        mcra=mcra_init(cfg.mcra, (*batch_shape, M), dtype=dtype),
        zeta_Y=one,
        zeta_U=jnp.zeros((*batch_shape, M - 1, F), dtype=dtype),
        lambda_d=z,
        gamma=one,
        G_H1=one,
        G=one,
        p=z,
        frm_cnt=jnp.asarray(0, jnp.int32),
    )


def _smooth3(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded [0.25, 0.5, 0.25] frequency smoothing (smooth_psd:44-46)."""
    left = jnp.pad(x[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    right = jnp.pad(x[..., 1:], [(0, 0)] * (x.ndim - 1) + [(0, 1)])
    return 0.25 * left + 0.5 * x + 0.25 * right


def omlsa_step(
    cfg: OmlsaConfig, state: OmlsaState, y: jnp.ndarray, u: jnp.ndarray
) -> Tuple[OmlsaState, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """One OM-LSA frame.

    y: [..., F] beam power spectrum; u: [..., M-1, F] reference powers.
    Returns (new_state, (lambda_d, p, G)).
    """
    is_first = state.frm_cnt == 0

    yu = jnp.concatenate([y[..., None, :], u], axis=-2)  # [..., M, F]
    mcra_state, (mu, _) = mcra_step(cfg.mcra, state.mcra, yu)
    MU_Y, MU_U = mu[..., 0, :], mu[..., 1:, :]

    # ---- recursion path (frames >= 1) -------------------------------------
    zeta_Y = cfg.alpha_s * state.zeta_Y + (1.0 - cfg.alpha_s) * _smooth3(y)
    zeta_U = cfg.alpha_s * state.zeta_U + (1.0 - cfg.alpha_s) * _smooth3(u)

    # Eq.6 transient beam-to-reference ratio
    omega = jnp.maximum(zeta_Y - MU_Y, 1e-6) / (
        jnp.maximum(jnp.max(zeta_U - MU_U, axis=-2), cfg.eps_tbrr * MU_Y) + 1e-6
    )
    omega = jnp.clip(omega, 0.1, 100.0)

    # Eq.27 posterior SNR at the beam output
    gamma_s = jnp.minimum(y / (MU_Y * cfg.Bmin + 1e-6), 100.0)

    # Eq.29 a-priori absence probability
    q_cand = jnp.maximum(
        (cfg.gamma_high - gamma_s) / (cfg.gamma_high - cfg.gamma_low),
        (cfg.omega_high - omega) / (cfg.omega_high - cfg.omega_low),
    )
    absent = (gamma_s < cfg.gamma_low) | (omega < cfg.omega_low)
    q_hat = jnp.clip(jnp.where(absent, 1.0, q_cand), cfg.q_min, cfg.q_max)

    gamma = y / jnp.maximum(state.lambda_d, 1e-10)
    # Eq.30 decision-directed prior SNR (uses previous frame's gamma and G_H1)
    xi_hat = cfg.alpha_xi * state.G_H1**2 * state.gamma + (1.0 - cfg.alpha_xi) * jnp.maximum(gamma - 1.0, 0.0)
    nu = gamma * xi_hat / (1.0 + xi_hat)
    G_H1 = xi_hat / (1.0 + xi_hat)

    # Eq.28 speech presence probability
    p = 1.0 / (1.0 + q_hat / (1.0 - q_hat) * (1.0 + xi_hat) * jnp.exp(-nu))

    alpha_tilde = cfg.alpha_d + (1.0 - cfg.alpha_d) * p
    lambda_d = alpha_tilde * state.lambda_d + cfg.beta * (1.0 - alpha_tilde) * y

    if cfg.cal_weights:
        G = jnp.clip(G_H1**p * cfg.gmin ** (1.0 - p), cfg.gmin, 1.0)
    else:
        G = state.G

    # ---- first-frame seeding (omlsa_multi.py:87-92) ------------------------
    new_state = OmlsaState(
        mcra=mcra_state,
        zeta_Y=jnp.where(is_first, y, zeta_Y),
        zeta_U=jnp.where(is_first, u, zeta_U),
        lambda_d=jnp.where(is_first, y, lambda_d),
        gamma=jnp.where(is_first, state.gamma, gamma),
        G_H1=jnp.where(is_first, state.G_H1, G_H1),
        G=jnp.where(is_first, state.G, G),
        p=jnp.where(is_first, state.p, p),
        frm_cnt=state.frm_cnt + 1,
    )
    return new_state, (new_state.lambda_d, new_state.p, new_state.G)


def omlsa_run(cfg: OmlsaConfig, Y_tf: jnp.ndarray, U_tf: jnp.ndarray):
    """Scan over frames.  Y_tf: [T, ..., F]; U_tf: [T, ..., M-1, F].

    Returns (lambda_d, p, G), each [T, ..., F].
    """
    state = omlsa_init(cfg, batch_shape=Y_tf.shape[1:-1], dtype=Y_tf.dtype)
    _, outs = jax.lax.scan(lambda s, yu: omlsa_step(cfg, s, yu[0], yu[1]), state, (Y_tf, U_tf))
    return outs
