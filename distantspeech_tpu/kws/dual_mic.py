"""Dual-mic KWS cleaner (Google "Hotword Cleaner" pattern).

Oracle: DualMicKws.process (/root/reference/DistantSpeech/kws/dual_mic_kws.py:111-152):
a continuously-adapting FLMS ANC (mic0 -> mic1) whose coefficients are
applied **1.5 seconds late** by a second, frozen filter — so the cleaner
never adapts to (and never cancels) the keyword itself, only to the earlier
interference.  Per frame: adapt ANC, push its taps into a FIFO, load the
FIFO tail into the cleaner, run the cleaner without updating.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from distantspeech_tpu.ops.dft import irdft, rdft

from distantspeech_tpu.adaptive.flms import FlmsConfig, FlmsState, flms_init, flms_step
from distantspeech_tpu.ops.delay import delay_frames, delay_frames_init


@dataclasses.dataclass(frozen=True)
class DualMicKwsConfig:
    frame_len: int = 256
    fs: int = 16000
    mu: float = 0.1
    alpha: float = 0.1
    defer_seconds: float = 1.5

    @property
    def flms(self) -> FlmsConfig:
        return FlmsConfig(filter_len=self.frame_len, mu=self.mu, alpha=self.alpha, non_causal=True)

    @property
    def delay_frames_n(self) -> int:
        # DelayFrames(frameLen, delay) queues delay+1 frames (dual_mic_kws.py:75-77)
        return int(self.defer_seconds * self.fs) // self.frame_len + 1


class DualMicKwsState(NamedTuple):
    anc: FlmsState
    cleaner: FlmsState
    w_fifo: jnp.ndarray  # deferred weights [..., D+1, filter_len]


def kws_init(cfg: DualMicKwsConfig, batch_shape=(), dtype=jnp.float32) -> DualMicKwsState:
    return DualMicKwsState(
        anc=flms_init(cfg.flms, batch_shape, dtype=dtype),
        cleaner=flms_init(cfg.flms, batch_shape, dtype=dtype),
        w_fifo=delay_frames_init(batch_shape, cfg.delay_frames_n, (cfg.frame_len,), dtype=dtype),
    )


def kws_step(
    cfg: DualMicKwsConfig, state: DualMicKwsState, x0: jnp.ndarray, x1: jnp.ndarray
) -> Tuple[DualMicKwsState, jnp.ndarray]:
    """One frameLen block.  x0, x1: [..., L] the two mics.

    Returns (state, cleaned [..., L])."""
    anc_state, (_, w) = flms_step(cfg.flms, state.anc, x0[..., None, :], x1)
    w_fifo, w_delayed = delay_frames(state.w_fifo, w[..., 0, :])

    # load deferred taps into the cleaner (set_weights, FastFreqLms.py:115-120)
    W_frozen = rdft(w_delayed, n=cfg.flms.n_fft, axis=-1)[..., None, :]
    cleaner_state = state.cleaner._replace(W=W_frozen)
    cleaner_state, (cleaned, _) = flms_step(
        cfg.flms, cleaner_state, x0[..., None, :], x1, update=0.0
    )
    return DualMicKwsState(anc=anc_state, cleaner=cleaner_state, w_fifo=w_fifo), cleaned


def kws_process(x: jnp.ndarray, cfg: DualMicKwsConfig = DualMicKwsConfig()) -> jnp.ndarray:
    """Offline cleaning.  x: [..., 2, S] -> [..., S]."""
    L = cfg.frame_len
    T = x.shape[-1] // L
    blocks = jnp.moveaxis(x[..., : T * L].reshape(*x.shape[:-1], T, L), -2, 0)  # [T, ..., 2, L]
    state = kws_init(cfg, batch_shape=x.shape[:-2], dtype=x.dtype)
    _, out = jax.lax.scan(
        lambda s, b: kws_step(cfg, s, b[..., 0, :], b[..., 1, :]), state, blocks
    )
    return jnp.moveaxis(out, 0, -2).reshape(*x.shape[:-2], T * L)
