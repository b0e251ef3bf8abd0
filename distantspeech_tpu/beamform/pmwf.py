"""Online PMWF beamformer driven by the MC-SPP noise tracker.

Capability: the "PMWF" leg of the reference's weight family
(compute_pmwf_weight, beamformer.py:100-130 / mcspp_base.py:220-258) wired
the way mcspp_base's demo uses it — the Souden SPP tracker estimates
Phi_vv/Phi_xx online and its parameterised multichannel Wiener weights are
applied to the input spectra, optionally with the OM-LSA gain on top
(compute_omlsa_weight, mcspp_base.py:140-156).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.noise.mcspp import McSppConfig, mcspp_init, mcspp_step
from distantspeech_tpu.noise.mcspp_base import McSppBaseConfig, mcspp_base_init, mcspp_base_step
from distantspeech_tpu.transform import StftConfig, analysis, synthesis


@dataclasses.dataclass(frozen=True)
class PmwfConfig:
    n_mics: int = 4
    frame_len: int = 256
    full: bool = True  # McSpp (CDR-driven) vs McSppBase (MCRA-driven)
    omlsa_gain: bool = True
    gmin: float = 0.0631

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.frame_len, self.frame_len // 2)


def pmwf_process(x: jnp.ndarray, geometry: ArrayGeometry, cfg: PmwfConfig = PmwfConfig()) -> jnp.ndarray:
    """Offline PMWF enhancement.  x: [..., M, S] -> [..., S]."""
    X = analysis(x, cfg.stft)  # [..., M, T, F]
    Zt = jnp.moveaxis(jnp.moveaxis(X, -3, -1), -3, 0)  # [T, ..., F, M]

    if cfg.full:
        scfg = McSppConfig(nfft=cfg.frame_len, n_channels=cfg.n_mics)
        Fn = jnp.asarray(scfg.mccdr.fn_pair(), dtype=x.dtype)
        state = mcspp_init(scfg, batch_shape=Zt.shape[1:-2], cdtype=Zt.dtype)
        step = lambda s, z: mcspp_step(scfg, Fn, s, z)
    else:
        scfg = McSppBaseConfig(nfft=cfg.frame_len, n_channels=cfg.n_mics)
        state = mcspp_base_init(scfg, batch_shape=Zt.shape[1:-2], cdtype=Zt.dtype)
        step = lambda s, z: mcspp_base_step(scfg, s, z)

    def body(s, z):
        s, out = step(s, z)
        # multiply-reduce over the tiny mic axis (see stats.linalg.matvec)
        y = jnp.sum(jnp.conj(out.w) * z, axis=-1)
        if cfg.omlsa_gain:
            G_H1 = out.xi / (1.0 + out.xi)
            G = jnp.clip(G_H1**out.p * cfg.gmin ** (1.0 - out.p), cfg.gmin, 1.0)
            y = y * G
        return s, y

    _, Y = jax.lax.scan(body, state, Zt)
    return synthesis(jnp.moveaxis(Y, 0, -2), cfg.stft)
