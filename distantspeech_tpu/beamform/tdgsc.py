"""Time-domain GSC: alignment -> mean FBF -> pairwise BM -> FLMS AIC.

Oracle: TDGSC.process (/root/reference/DistantSpeech/beamformer/TDGSC.py:110-172).
Block diagram per frameLen block: DC notch each mic, fractional-delay time
alignment, fixed beamformer = channel mean, pairwise-difference blocking
matrix, non-causal FLMS interference canceller stepped by (1 - p) from an
MCRA tracker (L=65) on the FBF spectrum, optional OMLSA-multi postfilter
applied as sqrt(G) through a streaming STFT round-trip.

TPU structure: everything frame-independent (notch, alignment, FBF, BM) is
computed over the whole utterance in one shot; only the genuinely recursive
parts (MCRA, FLMS, OMLSA, transform carries) ride the ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from distantspeech_tpu.adaptive.feature import dc_notch, dc_notch_init
from distantspeech_tpu.adaptive.flms import FlmsConfig, FlmsState, flms_init, flms_step
from distantspeech_tpu.array.alignment import time_alignment_filters
from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.noise.mcra import McraConfig, McraState, mcra_init, mcra_step
from distantspeech_tpu.noise.omlsa import OmlsaConfig, OmlsaState, omlsa_init, omlsa_step
from distantspeech_tpu.ops.fir import fir_filter_offline
from distantspeech_tpu.transform import StftConfig
from distantspeech_tpu.transform.stft import istft_stream, stft_stream


@dataclasses.dataclass(frozen=True)
class TdGscConfig:
    n_mics: int = 4
    frame_len: int = 256
    fir_truncate: int = 30  # TDGSC.py:107
    postfilter: bool = False
    vad_guard: bool = False  # additionally gate the AIC stepsize on MCRA's
    # RAW speech indicator S/Smin <= delta_s (the GSC-family analogue of
    # MvdrConfig.vad_guard).  The reference's MCRA forces p = 0 for its
    # first 2L = 130 frames (~2.1 s), so on captures that start mid-speech
    # the AIC adapts at FULL rate while the target is present and cancels
    # it through blocking-matrix leakage — measured −9.5 dB SI-SDR on the
    # real-speech mix (REAL_AUDIO.json, reference reproduces the same
    # number).  The raw indicator is exactly the statistic p is filtered
    # from, minus the warmup pinning.  False matches the reference
    # bit-exactly.

    @property
    def stft(self) -> StftConfig:
        # spp / postfilter transforms run at n_fft = 2*frameLen, hop = frameLen
        return StftConfig(self.frame_len * 2, self.frame_len)

    @property
    def half_bin(self) -> int:
        return self.frame_len + 1

    @property
    def mcra(self) -> McraConfig:
        return McraConfig(nfft=self.frame_len * 2, L=65)  # TDGSC.py:44-45

    @property
    def aic(self) -> FlmsConfig:
        return FlmsConfig(filter_len=self.frame_len, n_channels=self.n_mics - 1, non_causal=True)

    @property
    def omlsa(self) -> OmlsaConfig:
        return OmlsaConfig(nfft=self.frame_len * 2, n_channels=self.n_mics)


class TdGscState(NamedTuple):
    stft_fbf: jnp.ndarray  # spp-transform input carry [..., L]
    mcra: McraState
    aic: FlmsState
    omlsa: OmlsaState
    stft_y: jnp.ndarray  # postfilter analysis carry [..., L]
    stft_bm: jnp.ndarray  # postfilter reference carry [..., M-1, L]
    istft_y: jnp.ndarray  # postfilter synthesis carry [..., L]


def tdgsc_init(cfg: TdGscConfig, batch_shape=(), dtype=jnp.float32) -> TdGscState:
    L, C = cfg.frame_len, cfg.n_mics
    return TdGscState(
        stft_fbf=jnp.zeros((*batch_shape, L), dtype=dtype),
        mcra=mcra_init(cfg.mcra, batch_shape, dtype=dtype),
        aic=flms_init(cfg.aic, batch_shape, dtype=dtype),
        omlsa=omlsa_init(cfg.omlsa, batch_shape, dtype=dtype),
        stft_y=jnp.zeros((*batch_shape, L), dtype=dtype),
        stft_bm=jnp.zeros((*batch_shape, C - 1, L), dtype=dtype),
        istft_y=jnp.zeros((*batch_shape, L), dtype=dtype),
    )


def tdgsc_step(
    cfg: TdGscConfig, state: TdGscState, fbf: jnp.ndarray, bm: jnp.ndarray
) -> Tuple[TdGscState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One frameLen block.

    fbf: [..., L] fixed-beamformer block; bm: [..., M-1, L] blocking-matrix
    block.  Returns (state, (output [..., L], p [..., F]))."""
    scfg = cfg.stft
    stft_fbf, D = stft_stream(state.stft_fbf, fbf, scfg)  # [..., 1, F]
    power = jnp.abs(D[..., 0, :]) ** 2
    mcra_state, (_, p) = mcra_step(cfg.mcra, state.mcra, power)

    gate = 1.0 - p
    if cfg.vad_guard:
        Sr = mcra_state.S / (mcra_state.Smin + 1e-6)
        gate = gate * (Sr <= cfg.mcra.delta_s)
    aic_state, (out, _) = flms_step(
        cfg.aic, state.aic, bm, fbf, p=gate[..., None, :], fir_truncate=cfg.fir_truncate
    )

    omlsa_state, stft_y, stft_bm, istft_y = state.omlsa, state.stft_y, state.stft_bm, state.istft_y
    if cfg.postfilter:
        stft_y, Y = stft_stream(state.stft_y, out, scfg)  # [..., 1, F]
        stft_bm, U = stft_stream(state.stft_bm, bm, scfg)  # [..., M-1, 1, F]
        omlsa_state, (_, _, G) = omlsa_step(
            cfg.omlsa, state.omlsa,
            jnp.abs(Y[..., 0, :]) ** 2,
            jnp.abs(U[..., 0, :]) ** 2,
        )
        Yg = Y[..., 0, :] * jnp.sqrt(G).astype(Y.dtype)
        istft_y, out = istft_stream(state.istft_y, Yg[..., None, :], scfg)

    new_state = TdGscState(
        stft_fbf=stft_fbf, mcra=mcra_state, aic=aic_state,
        omlsa=omlsa_state, stft_y=stft_y, stft_bm=stft_bm, istft_y=istft_y,
    )
    return new_state, (out, p)


def tdgsc_process(
    x: jnp.ndarray, geometry: ArrayGeometry, angle_rad=(197.0 / 180.0 * np.pi, 0.0),
    cfg: TdGscConfig = TdGscConfig(), unroll: int = 1, backend: str = "scan",
):
    """Offline TDGSC.  x: [..., M, S] -> (output [..., S], p [..., T, F],
    bm_output [..., M-1, S]) like the reference's return tuple.

    ``unroll``: frame-scan lowering hint, numerically inert (see gsc.py).
    ``backend``: 'scan' (any batch shape / device) or 'fused' (the Pallas
    frame-loop kernel, TPU, [B, M, S] with B % 8 == 0; postfilter=True runs
    the OMLSA-in-kernel variant)."""
    if backend == "fused":
        from distantspeech_tpu.ops.pallas_flms import fused_tdgsc

        return fused_tdgsc(x, geometry, angle_rad, cfg)
    if backend != "scan":
        raise ValueError(f"unknown backend {backend!r}")
    L = cfg.frame_len
    # whole-utterance preprocessing (frame-independent)
    _, xn = dc_notch(dc_notch_init(x.shape[:-1], dtype=x.dtype), x, radius=0.98)
    coeffs = jnp.asarray(time_alignment_filters(geometry, angle_rad), dtype=x.dtype)
    aligned = fir_filter_offline(xn, coeffs)  # [..., M, S]
    fbf = jnp.mean(aligned, axis=-2)  # [..., S]
    bm = aligned[..., :-1, :] - aligned[..., 1:, :]  # [..., M-1, S]

    T = x.shape[-1] // L
    fbf_blocks = jnp.moveaxis(fbf[..., : T * L].reshape(*fbf.shape[:-1], T, L), -2, 0)
    bm_blocks = jnp.moveaxis(
        bm[..., : T * L].reshape(*bm.shape[:-1], T, L), -2, 0
    )  # [T, ..., M-1, L]

    state = tdgsc_init(cfg, batch_shape=x.shape[:-2], dtype=x.dtype)
    _, (out, p) = jax.lax.scan(
        lambda s, fb: tdgsc_step(cfg, s, fb[0], fb[1]), state, (fbf_blocks, bm_blocks),
        unroll=unroll,
    )
    out = jnp.moveaxis(out, 0, -2).reshape(*x.shape[:-2], T * L)
    return out, jnp.moveaxis(p, 0, -2), bm[..., : T * L]
