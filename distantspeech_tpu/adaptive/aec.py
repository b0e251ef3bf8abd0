"""Speex-style acoustic echo canceller on an MDF core.

Oracle: Aec.update (/root/reference/DistantSpeech/adaptivefilter/aec.py:227-393)
— two-path foreground/background MDF with the speex statistical transfer
logic (Davg/Dvar significance tests, transfer_logic aec.py:171-225), echo-leak
estimation by spectral linear regression (eq.19-21 of Valin 2007), a per-bin
optimal stepsize with 3-tap smoothing, and pre/de-emphasis around the
canceller.

The transfer-logic energies are global scalars: under bin sharding these
become one small ``psum`` per block (see SURVEY §2's TP note); everything
else is per-bin.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from distantspeech_tpu.ops.dft import irdft, rdft
import numpy as np

from distantspeech_tpu.adaptive.feature import EmphasisState, emphasis_init, de_emphasis, pre_emphasis
from distantspeech_tpu.adaptive.mdf import MdfConfig, mdf_adjust_prop
from distantspeech_tpu.ops.delay import delay_samples


@dataclasses.dataclass(frozen=True)
class AecConfig:
    filter_len: int = 1024
    num_block: int = 1
    mu: float = 0.01
    alpha: float = 0.8
    constrain: bool = True
    prop: bool = True
    two_path: bool = True
    non_causal: bool = False
    mu_max: float = 0.1
    gamma: float = 0.8  # Py/Pe pole (aec.py:318-324)
    fs: int = 16000

    @property
    def block_len(self) -> int:
        return self.filter_len // self.num_block

    @property
    def n_fft(self) -> int:
        return 2 * self.block_len

    @property
    def half_bin(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def beta0(self) -> float:
        return (2.0 * self.block_len) / self.fs

    def window(self) -> np.ndarray:
        n = np.arange(self.n_fft)
        return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / self.n_fft)


class AecState(NamedTuple):
    buf: jnp.ndarray  # far-end input buffer [..., n_fft]
    X: jnp.ndarray  # block spectra [..., B, Fb]
    W: jnp.ndarray  # background filter [..., B, Fb]
    foreground: jnp.ndarray  # foreground filter [..., B, Fb]
    Pm: jnp.ndarray  # [..., B, Fb]
    P: jnp.ndarray  # [..., Fb]
    power: jnp.ndarray  # smoothed far-end spectrum [..., Fb]
    Py: jnp.ndarray  # echo-estimate PSD track [..., Fb]
    Pe: jnp.ndarray  # error PSD track [..., Fb]
    Ryy: jnp.ndarray  # leak regression accumulators, scalars [...]
    Rey: jnp.ndarray
    Davg1: jnp.ndarray  # transfer-logic statistics, scalars [...]
    Davg2: jnp.ndarray
    Dvar1: jnp.ndarray
    Dvar2: jnp.ndarray
    cnt: jnp.ndarray  # frame counter, int32
    emph_mic: EmphasisState
    emph_spk: EmphasisState
    d_delay: jnp.ndarray


def aec_init(cfg: AecConfig, batch_shape=(), dtype=jnp.float32) -> AecState:
    B, Fb = cfg.num_block, cfg.half_bin
    cdtype = jnp.result_type(dtype, jnp.complex64)
    zc = jnp.zeros((*batch_shape, B, Fb), dtype=cdtype)
    zr = jnp.zeros((*batch_shape, B, Fb), dtype=dtype)
    zf = jnp.zeros((*batch_shape, Fb), dtype=dtype)
    s = jnp.zeros(batch_shape, dtype=dtype)
    D = cfg.filter_len // 2 if cfg.non_causal else 0
    return AecState(
        buf=jnp.zeros((*batch_shape, cfg.n_fft), dtype=dtype),
        X=zc,
        W=zc,
        foreground=zc,
        Pm=zr,
        P=zf,
        power=zf,
        Py=zf,
        Pe=zf,
        Ryy=jnp.ones(batch_shape, dtype=dtype),
        Rey=jnp.ones(batch_shape, dtype=dtype),
        Davg1=s,
        Davg2=s,
        Dvar1=s,
        Dvar2=s,
        cnt=jnp.asarray(0, jnp.int32),
        emph_mic=emphasis_init(batch_shape, dtype=dtype),
        emph_spk=emphasis_init(batch_shape, dtype=dtype),
        d_delay=jnp.zeros((*batch_shape, D), dtype=dtype),
    )


def aec_step(
    cfg: AecConfig, state: AecState, x: jnp.ndarray, d: jnp.ndarray, update=True
) -> Tuple[AecState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One block of echo cancellation.

    x: [..., block_len] far-end (speaker) block; d: [..., block_len]
    near-end (mic) block.  Returns (state, (out [..., block_len],
    w [..., filter_len])).
    """
    L, n_fft = cfg.block_len, cfg.n_fft

    emph_mic, d = pre_emphasis(state.emph_mic, d)
    emph_spk, x = pre_emphasis(state.emph_spk, x)

    buf = jnp.concatenate([state.buf[..., L:], x], axis=-1)
    Xm = rdft(buf, n=n_fft, axis=-1)
    X = jnp.concatenate([Xm[..., None, :], state.X[..., :-1, :]], axis=-2)

    ss = 0.35 / cfg.num_block
    power = (1.0 - ss) * state.power + ss * jnp.abs(Xm) ** 2

    Pm_new = jnp.real(Xm * jnp.conj(Xm))
    Pm = jnp.concatenate([Pm_new[..., None, :], state.Pm[..., :-1, :]], axis=-2)
    P = cfg.alpha * state.P + (1.0 - cfg.alpha) * jnp.sum(Pm, axis=-2)

    Y = jnp.sum(X * state.W, axis=-2)  # [..., Fb]
    y_b = irdft(Y, n=n_fft, axis=-1)[..., -L:]
    y_f = irdft(jnp.sum(X * state.foreground, axis=-2), n=n_fft, axis=-1)[..., -L:]

    d_delay = state.d_delay
    if cfg.non_causal:
        d_delay, d = delay_samples(state.d_delay, d)

    e_b = d - y_b
    e_f = d - y_f

    Davg1, Davg2, Dvar1, Dvar2 = state.Davg1, state.Davg2, state.Dvar1, state.Dvar2
    foreground = state.foreground
    if cfg.two_path:
        # speex statistical transfer logic (aec.py:171-225)
        Sff = jnp.sum(jnp.abs(e_f) ** 2, axis=-1)
        See = jnp.sum(jnp.abs(e_b) ** 2, axis=-1)
        Dbf = jnp.sum(jnp.abs(y_f - y_b) ** 2, axis=-1)
        Davg1 = 0.6 * Davg1 + 0.4 * (Sff - See)
        Davg2 = 0.85 * Davg2 + 0.15 * (Sff - See)
        Dvar1 = 0.36 * Dvar1 + 0.16 * Sff * Dbf
        Dvar2 = 0.7225 * Dvar2 + 0.0225 * Sff * Dbf
        upd = (
            ((Sff - See) * jnp.abs(Sff - See) > Sff * Dbf)
            | (Davg1 * jnp.abs(Davg1) > 0.5 * Dvar1)
            | (Davg2 * jnp.abs(Davg2) > 0.25 * Dvar2)
        )
        zero = jnp.zeros_like(Davg1)
        Davg1 = jnp.where(upd, zero, Davg1)
        Davg2 = jnp.where(upd, zero, Davg2)
        Dvar1 = jnp.where(upd, zero, Dvar1)
        Dvar2 = jnp.where(upd, zero, Dvar2)
        foreground = jnp.where(upd[..., None, None], state.W, state.foreground)
        win = jnp.asarray(cfg.window(), dtype=y_f.dtype)
        y_f = jnp.where(upd[..., None], win[L:] * y_f + win[:L] * y_b, y_f)
        out = d - y_f
    else:
        out = e_b

    pad = [(0, 0)] * (e_b.ndim - 1) + [(L, 0)]
    E = rdft(jnp.pad(e_b, pad), n=n_fft, axis=-1)

    # ---- leak estimation (aec.py:306-345, Valin 2007 eqs.17-22) -----------
    Yf_sq = jnp.abs(Y * jnp.conj(Y))
    Rf_sq = jnp.abs(E * jnp.conj(E))
    g, g1 = cfg.gamma, 1.0 - cfg.gamma
    Py = g1 * state.Py + g * Yf_sq
    Pe = g1 * state.Pe + g * Rf_sq
    Eh = Rf_sq - Pe
    Yh = Yf_sq - Py
    Pey = jnp.sum(Eh * Yh, axis=-1) / (jnp.sqrt(jnp.sum(Yh**2, axis=-1)) + 1e-6)
    Pyy = jnp.sqrt(jnp.sum(Yh**2, axis=-1))

    Syy = jnp.sum(y_b**2, axis=-1)
    See_b = jnp.sum(e_b**2, axis=-1)
    a = cfg.beta0 * jnp.minimum(Syy / See_b, 1.0)
    Ryy = (1.0 - a) * state.Ryy + a * Pyy
    Rey = (1.0 - a) * state.Rey + a * Pey
    leak = Rey / (Ryy + 1e-6)

    mu_opt = leak[..., None] * jnp.abs(Y) ** 2 / (jnp.abs(E) ** 2 + 1e-3)
    mu_opt = mu_opt.at[..., :2].multiply(2.0)
    mu_opt = jnp.clip(mu_opt, 1e-3, cfg.mu_max)
    # 3-tap 'same' smoothing (aec.py:349-351)
    mu_pad = jnp.pad(mu_opt, [(0, 0)] * (mu_opt.ndim - 1) + [(1, 1)])
    mu_opt = 0.25 * mu_pad[..., :-2] + 0.5 * mu_pad[..., 1:-1] + 0.25 * mu_pad[..., 2:]
    mu_opt = jnp.where(state.cnt < 5, jnp.full_like(mu_opt, 0.1), mu_opt)

    grad = jnp.conj(X) * E[..., None, :] / (P + 1e-6)[..., None, :]
    if cfg.constrain:
        g1t = irdft(grad, n=n_fft, axis=-1)
        g1t = g1t.at[..., -L:].set(0.0)
        grad = rdft(g1t, n=n_fft, axis=-1)

    gate = jnp.asarray(update, dtype=P.dtype)
    if cfg.prop:
        prop = mdf_adjust_prop(state.W)
        W = state.W + gate * prop[..., :, None] * mu_opt[..., None, :] * grad
    else:
        W = state.W + gate * mu_opt[..., None, :] * grad

    w_blocks = irdft(W, n=n_fft, axis=-1)[..., :L]
    w = w_blocks.reshape(*w_blocks.shape[:-2], -1)

    emph_mic, out = de_emphasis(emph_mic, out)

    new_state = AecState(
        buf=buf, X=X, W=W, foreground=foreground, Pm=Pm, P=P, power=power,
        Py=Py, Pe=Pe, Ryy=Ryy, Rey=Rey,
        Davg1=Davg1, Davg2=Davg2, Dvar1=Dvar1, Dvar2=Dvar2,
        cnt=state.cnt + 1, emph_mic=emph_mic, emph_spk=emph_spk, d_delay=d_delay,
    )
    return new_state, (out, w)
