"""Multidelay block frequency-domain adaptive filter (MDF, Soo & Pang 1990).

Oracle: Mdf.update (/root/reference/DistantSpeech/adaptivefilter/mdf.py:130-216).
A partitioned FLMS: the filter is split into ``num_block`` blocks of
``block_len`` taps; each step shifts the newest input-block spectrum into a
[..., B, Fb] matrix and the filtered output is the block-sum of X*W.
Optionally proportionate (speex-style per-block stepsizes,
mdf_adjust_prop, mdf.py:38-60).

Layout: block axis before the FFT axis ([..., B, Fb]) so the per-bin
block-sum is a cheap reduce and the FFTs batch over blocks.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from distantspeech_tpu.ops.dft import irdft, rdft

from distantspeech_tpu.ops.delay import delay_samples


@dataclasses.dataclass(frozen=True)
class MdfConfig:
    filter_len: int = 1024
    num_block: int = 1
    mu: float = 0.01
    alpha: float = 0.8
    constrain: bool = True
    prop: bool = False
    non_causal: bool = False

    @property
    def block_len(self) -> int:
        return self.filter_len // self.num_block

    @property
    def n_fft(self) -> int:
        return 2 * self.block_len

    @property
    def half_bin(self) -> int:
        return self.n_fft // 2 + 1


class MdfState(NamedTuple):
    buf: jnp.ndarray  # time input buffer [..., n_fft]
    X: jnp.ndarray  # block spectra [..., B, Fb], newest block first
    W: jnp.ndarray  # block filters [..., B, Fb]
    Pm: jnp.ndarray  # per-block powers [..., B, Fb]
    P: jnp.ndarray  # smoothed total power [..., Fb]
    d_delay: jnp.ndarray  # non-causal carry [..., D]


def mdf_init(cfg: MdfConfig, batch_shape=(), dtype=jnp.float32) -> MdfState:
    B, Fb = cfg.num_block, cfg.half_bin
    cdtype = jnp.result_type(dtype, jnp.complex64)
    D = cfg.filter_len // 2 if cfg.non_causal else 0
    return MdfState(
        buf=jnp.zeros((*batch_shape, cfg.n_fft), dtype=dtype),
        X=jnp.zeros((*batch_shape, B, Fb), dtype=cdtype),
        W=jnp.zeros((*batch_shape, B, Fb), dtype=cdtype),
        Pm=jnp.zeros((*batch_shape, B, Fb), dtype=dtype),
        P=jnp.zeros((*batch_shape, Fb), dtype=dtype),
        d_delay=jnp.zeros((*batch_shape, D), dtype=dtype),
    )


def mdf_adjust_prop(W: jnp.ndarray) -> jnp.ndarray:
    """Speex proportionate per-block stepsizes (mdf.py:38-60).

    W: [..., B, Fb] -> prop: [..., B].
    """
    prop = jnp.sqrt(jnp.sum(jnp.abs(W) ** 2, axis=-1))
    max_sum = jnp.maximum(prop, 1e-6)
    prop = prop + 0.1 * max_sum
    return 0.99 * prop / (1e-6 + jnp.sum(prop, axis=-1, keepdims=True))


def mdf_step(
    cfg: MdfConfig,
    state: MdfState,
    x: jnp.ndarray,
    d: jnp.ndarray,
    update=True,
    p=1.0,
    fir_truncate: Optional[int] = None,
) -> Tuple[MdfState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One block of MDF.

    x, d: [..., block_len].  Returns (state, (e [..., block_len],
    w [..., filter_len] concatenated block taps)).
    """
    L, n_fft = cfg.block_len, cfg.n_fft

    buf = jnp.concatenate([state.buf[..., L:], x], axis=-1)
    Xm = rdft(buf, n=n_fft, axis=-1)  # [..., Fb]
    X = jnp.concatenate([Xm[..., None, :], state.X[..., :-1, :]], axis=-2)

    Pm_new = jnp.real(Xm * jnp.conj(Xm))
    Pm = jnp.concatenate([Pm_new[..., None, :], state.Pm[..., :-1, :]], axis=-2)
    P = cfg.alpha * state.P + (1.0 - cfg.alpha) * jnp.sum(Pm, axis=-2)

    y = irdft(jnp.sum(X * state.W, axis=-2), n=n_fft, axis=-1)[..., -L:]

    d_delay = state.d_delay
    if cfg.non_causal:
        d_delay, d = delay_samples(state.d_delay, d)
    e = d - y

    pad = [(0, 0)] * (e.ndim - 1) + [(L, 0)]
    E = rdft(jnp.pad(e, pad), n=n_fft, axis=-1)
    grad = jnp.conj(X) * E[..., None, :] / (P + 1e-6)[..., None, :]

    if cfg.constrain:
        g1 = irdft(grad, n=n_fft, axis=-1)
        g1 = g1.at[..., -L:].set(0.0)
        grad = rdft(g1, n=n_fft, axis=-1)

    gate = jnp.asarray(update, dtype=P.dtype)
    if cfg.prop:
        prop = mdf_adjust_prop(state.W)  # [..., B]
        W = state.W + gate * prop[..., :, None] * p * cfg.mu * grad
    else:
        W = state.W + gate * p * 2.0 * cfg.mu * grad

    # concatenated taps: block b occupies [b*L : (b+1)*L] (mdf.py:205-208)
    w_blocks = irdft(W, n=n_fft, axis=-1)[..., :L]  # [..., B, L]
    w = w_blocks.reshape(*w_blocks.shape[:-2], -1)

    if fir_truncate is not None:
        if cfg.num_block != 1:
            raise ValueError("fir_truncate only supported for num_block == 1 (bit-rotted in the reference otherwise)")
        w_shift = w.at[..., :fir_truncate].set(0.0).at[..., -fir_truncate:].set(0.0)
        W = rdft(w_shift, n=n_fft, axis=-1)[..., None, :]

    return MdfState(buf=buf, X=X, W=W, Pm=Pm, P=P, d_delay=d_delay), (e, w)
