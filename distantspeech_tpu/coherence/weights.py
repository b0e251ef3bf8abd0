"""Coherence-based dual-mic gain rules, vectorised over frequency bins.

Oracle: getweghts_coherent
(/root/reference/DistantSpeech/coherence/getweights_coherent.py:30-161) — five
published gain formulas (Yousefian/Loizou 2012+2013, Ji 2017 coherent models)
selected by ``method``.  The reference computes one scalar per bin in a
Python loop; here every formula is an elementwise tensor expression over the
whole ``[..., F]`` coherence vectors.

Reference quirks kept bit-for-bit: the geometry constant uses **hardcoded**
fs=16000, nfft=256, c=340 regardless of the actual transform size
(getweights_coherent.py:32-34); the gain floor is 0.02; NaN gains are
replaced by the floor (:154-159).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_C = 340.0
_FS = 16000.0
_NFFT = 256.0
_FVV_UPPER = 0.998
_GAIN_FLOOR = 0.02
_EPS = 1e-6


def coherent_gain(
    Fvv_est: jnp.ndarray, Fvv_diffuse: jnp.ndarray, method: int = 3, r: float = 0.032
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gain for one mic pair across all bins.

    Fvv_est: [..., F] complex estimated coherence; Fvv_diffuse: [F] real
    diffuse-model coherence.  Returns (G [..., F], SNR [..., F]); SNR is only
    meaningful for method 5 (zero otherwise, like the reference).
    """
    F = Fvv_est.shape[-1]
    k = jnp.arange(F, dtype=Fvv_est.real.dtype)

    Fy_real = jnp.minimum(jnp.real(Fvv_est), _FVV_UPPER)
    Fy_imag = jnp.imag(Fvv_est)
    Fn = jnp.minimum(Fvv_diffuse, _FVV_UPPER)
    abs_est = jnp.minimum(jnp.sqrt(Fy_real**2 + Fy_imag**2), _FVV_UPPER)

    DDR = (jnp.abs(Fn) ** 2 - abs_est**2) / (abs_est**2 - 1.0)  # eq.10
    K = DDR / (DDR + 1.0)

    snr = jnp.zeros_like(Fy_real)

    # methods 1/2/5 read the *unclipped* real part, like the reference does
    raw_real = jnp.real(Fvv_est)

    if method == 0:
        G = jnp.ones_like(Fy_real)
    elif method == 1:
        # Yousefian/Loizou 2012 eq.15 with low/high-band constants
        low = k <= 16
        alpha_exp = jnp.where(low, 16.0, 2.0)
        Q = jnp.where(low, -0.1, -0.3)
        G1 = 1.0 - jnp.abs(raw_real) ** alpha_exp
        G2 = jnp.where(Fy_imag < Q, 0.5, 1.0)
        G = G1 * G2
    elif method == 2:
        # Yousefian 2014 real-coherence rule
        G = (1.0 - raw_real**2 - Fy_imag**2) / (2.0 * (1.0 - raw_real))
    elif method in (3, 4):
        # Ji/Byun/Park 2017 (eqs. 12/17-22)
        theta_s = np.pi / 2
        constant = 2.0 * np.pi * k * _FS * r / (_NFFT * _C)
        sin_alpha = jnp.sin(constant * np.sin(theta_s))
        cos_alpha = jnp.cos(constant * np.sin(theta_s))

        A = sin_alpha * K - Fy_imag
        B = cos_alpha * K - Fy_real + Fn * (1.0 - K)  # eq.20
        Cc = (Fy_real - Fn * (1.0 - K)) * sin_alpha - Fy_imag * cos_alpha
        T = K - cos_alpha * (Fy_real - Fn * (1.0 - K)) - Fy_imag * sin_alpha
        sin_beta = (-B * Cc - A * T) / (A**2 + B**2 + _EPS)  # eq.21
        if method == 3:
            G = (Fy_imag - sin_beta * K) / (sin_alpha - sin_beta + _EPS)  # eq.12
        else:
            cos_beta = (A * Cc - B * T) / (A**2 + B**2 + _EPS)  # eq.22
            A_ = cos_alpha - cos_beta
            B_ = cos_beta + Fn * (1.0 - K)  # eq.16
            C_ = sin_alpha - sin_beta
            D_ = sin_beta * K
            gamma_sign = jnp.where(jnp.abs(Fy_imag - sin_alpha) < jnp.abs(Fy_imag - sin_beta), 1.0, -1.0)
            T_ = jnp.maximum(abs_est**2 * (A_**2 + C_**2) - (A_ * D_ - B_ * C_) ** 2, _EPS)
            G = -(A_ * B_ + C_ * D_) + gamma_sign * jnp.sqrt(T_) / (A_**2 + C_**2 + _EPS)  # eq.17
    elif method == 5:
        # Yousefian/Loizou 2013 competing-talker SNR rule (unclipped inputs)
        omega_ = 2.0 * np.pi * k / _NFFT * (_FS * r / _C)
        beta_ang = omega_ * np.cos(0.0)  # target endfire
        A = Fy_imag - jnp.sin(omega_)
        B = jnp.cos(omega_) - raw_real
        Cc = raw_real * jnp.sin(omega_) - Fy_imag * jnp.cos(omega_)
        T = 1.0 - raw_real * jnp.cos(omega_) - Fy_imag * jnp.sin(omega_)
        sin_alpha = (-B * Cc + A * T) / (A**2 + B**2 + _EPS)  # eq.14
        snr = jnp.maximum((sin_alpha - Fy_imag) / (Fy_imag - jnp.sin(beta_ang) + _EPS), _EPS)  # eq.10
        G = jnp.sqrt(snr / (snr + 1.0))
    else:
        raise ValueError(f"unknown method {method}")

    G = jnp.where(G < _GAIN_FLOOR, _GAIN_FLOOR, G)
    G = jnp.where(G >= 1.0, 1.0, G)
    G = jnp.where(jnp.isnan(G), _GAIN_FLOOR, G)
    return G, snr
