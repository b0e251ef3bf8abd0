"""Fused speex-style AEC: the whole two-path MDF frame recursion in ONE
Pallas call.

Oracle: Aec.update (/root/reference/DistantSpeech/adaptivefilter/aec.py:
227-393) with the statistical transfer logic (:171-225), echo-leak spectral
regression (Valin 2007 eqs.17-22, :306-345) and the speex proportionate
block stepsizes (mdf.py:38-60).  Same fusion recipe as ops.pallas_flms: the
far-end is input-only, so its pre-emphasis and block spectra batch into
bulk ops; the frame loop keeps the background/foreground filters as packed
frequency-plane scratch (their per-bin mu_opt update spreads tap support
over the full n_fft, so tap-space state does not apply here), and the
mic-side de-emphasis IIR of the output runs as a blocked state-space dot.

The full_stack batches M mic channels against one shared far-end: the M
cancellers share the far-end spectra, powers and the P normalisation; the
transfer-logic statistics, leak regressions and emphasis carries are
per-mic lanes of one auxiliary tile.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distantspeech_tpu.ops.pallas_enhance import _SUB, _pick_t_chunk
from distantspeech_tpu.ops.pallas_flms import (
    _bulk_analysis, _cmul_acc, _cmul_conj, _dot, plain_dft_packed,
)


@lru_cache(maxsize=None)
def _deemph_mats(n: int, alpha: float):
    """Blocked first-order IIR y[n] = x[n] + alpha y[n-1]: in-block
    lower-triangular Toeplitz response + initial-state decay (float64)."""
    j = np.arange(n)[None, :]
    m = np.arange(n)[:, None]
    R1 = np.where(j >= m, alpha ** np.maximum(j - m, 0), 0.0)
    decay = alpha ** (np.arange(n) + 1.0)
    return R1, decay


def _aec_kernel(
    sig_ref, halo_ref, d_ref, cs_ref, ab_ref, win_ref, r1_ref,  # inputs
    o_ref,  # output: echo-free mic blocks [tc, 1, M, sub, hop]
    Zr, Zi, ZpR, ZpI, Wr, Wi, Fr, Fi, P, PN, Py, PyN, Pe, PeN, Aux,  # scratch
    *, Tc: int, M: int, NB: int, fl: int, hop: int, sub: int,
    alpha: float, mu_max: float, gamma: float, beta0: float,
):
    """Per frame: 6 small in-VMEM dots (y_bg, y_fg, E, the gradient
    constraint round-trip, the de-emphasis IIR) plus the speex two-path /
    leak / proportionate logic on vreg tiles.  ``Aux`` lane slots (per mic
    m): m Ryy | M+m Rey | 2M+m Davg1 | 3M+m Davg2 | 4M+m Dvar1 | 5M+m Dvar2
    | 6M+m memE (de-emphasis carry)."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (ZpR, ZpI, Wr, Wi, Fr, Fi, P, PN, Py, PyN, Pe, PeN):
            ref[...] = jnp.zeros_like(ref)
        lane = jax.lax.broadcasted_iota(jnp.int32, Aux.shape, 1)
        Aux[...] = jnp.where(lane < 2 * M, 1.0, 0.0)  # Ryy = Rey = 1

    _bulk_analysis(sig_ref, halo_ref, cs_ref, Zr, Zi, 1, Tc, sub, hop, fl)

    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, fl), 1)
    mask0 = lane == 0
    mask01 = lane < 2  # bins 0 and 1 get 2x mu (aec.py:347)
    aux_lane = jax.lax.broadcasted_iota(jnp.int32, Aux.shape, 1)
    chunk_base = pl.program_id(1) * Tc
    g, g1c = gamma, 1.0 - gamma

    def col(k):
        return Aux[...][:, k : k + 1]

    def frame(t, _):
        tg = chunk_base + t
        aux = Aux[...]

        # far-end block spectra X_b = Xm[t - b] (shared by every mic)
        zr0, zi0 = Zr[0, t], Zi[0, t]
        zr1r = Zr[0, jnp.maximum(t - 1, 0)]
        zi1r = Zi[0, jnp.maximum(t - 1, 0)]
        first = t == 0
        zr1 = jnp.where(first, ZpR[...], zr1r)
        zi1 = jnp.where(first, ZpI[...], zi1r)
        Xs = [(zr0, zi0), (zr1, zi1)][:NB]

        # shared power normalisation (mdf.py:103-105)
        pw = jnp.zeros((sub, fl), jnp.float32)
        pwn = jnp.zeros((sub, fl), jnp.float32)
        for xr, xi in Xs:
            pw = pw + xr * xr + jnp.where(mask0, 0.0, xi * xi)
            pwn = pwn + xi * xi
        Pc = alpha * P[...] + (1.0 - alpha) * pw
        PNc = alpha * PN[...] + (1.0 - alpha) * pwn
        P[...] = Pc
        PN[...] = PNc
        Pi = jnp.where(mask0, PNc, Pc) + 1e-6
        Pr = Pc + 1e-6

        # background / foreground outputs for every mic
        Yb_r, Yb_i, Yf_r, Yf_i = [], [], [], []
        for m in range(M):
            br = jnp.zeros((sub, fl), jnp.float32)
            bi = jnp.zeros((sub, fl), jnp.float32)
            fr = jnp.zeros((sub, fl), jnp.float32)
            fi = jnp.zeros((sub, fl), jnp.float32)
            for b, (xr, xi) in enumerate(Xs):
                k = m * NB + b
                r, i = _cmul_acc(xr, xi, Wr[k], Wi[k], mask0)
                br, bi = br + r, bi + i
                r, i = _cmul_acc(xr, xi, Fr[k], Fi[k], mask0)
                fr, fi = fr + r, fi + i
            Yb_r.append(br); Yb_i.append(bi); Yf_r.append(fr); Yf_i.append(fi)
        yb = _dot(jnp.concatenate(
            [jnp.concatenate([Yb_r[m], Yb_i[m]], axis=-1) for m in range(M)], axis=0
        ), ab_ref[:, hop:]).reshape(M, sub, hop)
        yf = _dot(jnp.concatenate(
            [jnp.concatenate([Yf_r[m], Yf_i[m]], axis=-1) for m in range(M)], axis=0
        ), ab_ref[:, hop:]).reshape(M, sub, hop)

        d_t = d_ref[t, 0]  # [M, sub, hop] pre-emphasised mic blocks
        e_b = d_t - yb
        e_f = d_t - yf

        # ---- two-path transfer logic (aec.py:171-225), per mic ------------
        win_head = jnp.broadcast_to(win_ref[0:1, :hop], (sub, hop))
        win_tail = jnp.broadcast_to(win_ref[0:1, hop:], (sub, hop))
        out_list, new_cols = [], {}
        for m in range(M):
            Sff = jnp.sum(e_f[m] * e_f[m], axis=1, keepdims=True)
            See = jnp.sum(e_b[m] * e_b[m], axis=1, keepdims=True)
            dby = yf[m] - yb[m]
            Dbf = jnp.sum(dby * dby, axis=1, keepdims=True)
            Davg1 = 0.6 * col(2 * M + m) + 0.4 * (Sff - See)
            Davg2 = 0.85 * col(3 * M + m) + 0.15 * (Sff - See)
            Dvar1 = 0.36 * col(4 * M + m) + 0.16 * Sff * Dbf
            Dvar2 = 0.7225 * col(5 * M + m) + 0.0225 * Sff * Dbf
            upd = (
                ((Sff - See) * jnp.abs(Sff - See) > Sff * Dbf)
                | (Davg1 * jnp.abs(Davg1) > 0.5 * Dvar1)
                | (Davg2 * jnp.abs(Davg2) > 0.25 * Dvar2)
            )
            zero = jnp.zeros_like(Davg1)
            new_cols[2 * M + m] = jnp.where(upd, zero, Davg1)
            new_cols[3 * M + m] = jnp.where(upd, zero, Davg2)
            new_cols[4 * M + m] = jnp.where(upd, zero, Dvar1)
            new_cols[5 * M + m] = jnp.where(upd, zero, Dvar2)
            for b in range(NB):
                k = m * NB + b
                Fr[k] = jnp.where(upd, Wr[k], Fr[k])
                Fi[k] = jnp.where(upd, Wi[k], Fi[k])
            yfm = jnp.where(upd, win_tail * yf[m] + win_head * yb[m], yf[m])
            out_list.append(d_t[m] - yfm)

            # ---- leak regression + Ryy/Rey (aec.py:306-345) ----------------
            Ysq = Yb_r[m] * Yb_r[m] + jnp.where(mask0, 0.0, Yb_i[m] * Yb_i[m])
            Ysq_n = Yb_i[m][:, :1] * Yb_i[m][:, :1]
            # E of the BACKGROUND error, needed below for the gradient too
            new_cols.setdefault("_stash", {})[m] = (Ysq, Ysq_n)

        out = jnp.stack(out_list)  # [M, sub, hop]

        Ez = _dot(e_b.reshape(M * sub, hop), cs_ref[hop:]).reshape(M, sub, 2 * fl)

        mu_list = []
        for m in range(M):
            Er, Ei = Ez[m, :, :fl], Ez[m, :, fl:]
            Rsq = Er * Er + jnp.where(mask0, 0.0, Ei * Ei)
            Rsq_n = Ei[:, :1] * Ei[:, :1]
            Ysq, Ysq_n = new_cols["_stash"][m]
            Py_c = g1c * Py[m] + g * Ysq
            Pe_c = g1c * Pe[m] + g * Rsq
            PyN_c = g1c * PyN[...][:, m : m + 1] + g * Ysq_n
            PeN_c = g1c * PeN[...][:, m : m + 1] + g * Rsq_n
            Py[m] = Py_c
            Pe[m] = Pe_c
            pyn_l = jax.lax.broadcasted_iota(jnp.int32, PyN.shape, 1) == m
            PyN[...] = jnp.where(pyn_l, PyN_c, PyN[...])
            PeN[...] = jnp.where(pyn_l, PeN_c, PeN[...])

            Eh = Rsq - Pe_c
            Yh = Ysq - Py_c
            Eh_n = Rsq_n - PeN_c
            Yh_n = Ysq_n - PyN_c
            sYY = jnp.sum(Yh * Yh, axis=1, keepdims=True) + Yh_n * Yh_n
            sEY = jnp.sum(Eh * Yh, axis=1, keepdims=True) + Eh_n * Yh_n
            Pyy = jnp.sqrt(sYY)
            Pey = sEY / (Pyy + 1e-6)

            Syy = jnp.sum(yb[m] * yb[m], axis=1, keepdims=True)
            See_b = jnp.sum(e_b[m] * e_b[m], axis=1, keepdims=True)
            a = beta0 * jnp.minimum(Syy / See_b, 1.0)
            Ryy = (1.0 - a) * col(m) + a * Pyy
            Rey = (1.0 - a) * col(M + m) + a * Pey
            new_cols[m] = Ryy
            new_cols[M + m] = Rey
            leak = Rey / (Ryy + 1e-6)

            # per-bin optimal stepsize + 3-tap zero-padded smoothing
            mu = leak * Ysq / (Rsq + 1e-3)
            mu_n = leak * Ysq_n / (Rsq_n + 1e-3)
            mu = jnp.where(mask01, 2.0 * mu, mu)
            mu = jnp.clip(mu, 1e-3, mu_max)
            mu_n = jnp.clip(mu_n, 1e-3, mu_max)
            left = jnp.concatenate([jnp.zeros_like(mu[:, :1]), mu[:, :-1]], axis=1)
            right = jnp.concatenate([mu[:, 1:], mu_n], axis=1)
            mu_s = 0.25 * left + 0.5 * mu + 0.25 * right
            mu_n_s = 0.25 * mu[:, -1:] + 0.5 * mu_n
            warm = tg < 5  # (aec.py:352-353)
            mu_s = jnp.where(warm, 0.1, mu_s)
            mu_n_s = jnp.where(warm, 0.1, mu_n_s)
            mu_list.append((mu_s, jnp.where(mask0, mu_n_s, mu_s)))

        del new_cols["_stash"]

        # ---- constrained gradient + proportionate update -------------------
        Gs = []
        for m in range(M):
            Er, Ei = Ez[m, :, :fl], Ez[m, :, fl:]
            for xr, xi in Xs:
                gr, gi = _cmul_conj(xr, xi, Er, Ei, mask0)
                Gs.append(jnp.concatenate([gr / Pr, gi / Pi], axis=-1))
        g_t = _dot(jnp.concatenate(Gs, axis=0), ab_ref[:, :hop])  # keep first L
        Gc = _dot(g_t, cs_ref[:hop]).reshape(M, NB, sub, 2 * fl)

        for m in range(M):
            # speex proportionate block stepsizes from the CURRENT W
            props = []
            for b in range(NB):
                k = m * NB + b
                s = jnp.sum(Wr[k] * Wr[k] + jnp.where(mask0, 0.0, Wi[k] * Wi[k]), axis=1, keepdims=True)
                s = s + Wi[k][:, :1] * Wi[k][:, :1]
                props.append(jnp.sqrt(s))
            tot = jnp.zeros_like(props[0])
            props = [pb + 0.1 * jnp.maximum(pb, 1e-6) for pb in props]
            for pb in props:
                tot = tot + pb
            mu_r, mu_i = mu_list[m]
            for b in range(NB):
                k = m * NB + b
                scale = 0.99 * props[b] / (1e-6 + tot)
                Wr[k] = Wr[k] + scale * mu_r * Gc[m, b, :, :fl]
                Wi[k] = Wi[k] + scale * mu_i * Gc[m, b, :, fl:]

        # ---- de-emphasis IIR of the output (blocked state-space) ----------
        memE = jnp.concatenate([col(6 * M + m) for m in range(M)], axis=1)  # [sub, M]
        y_de = _dot(out.reshape(M * sub, hop), r1_ref[: hop]).reshape(M, sub, hop)
        decay = jnp.broadcast_to(r1_ref[hop : hop + 1], (sub, hop))  # alpha^{j+1}
        outs = []
        for m in range(M):
            o_m = y_de[m] + memE[:, m : m + 1] * decay
            outs.append(o_m)
            new_cols[6 * M + m] = o_m[:, -1:]
        o_ref[t, 0] = jnp.stack(outs)

        # ---- write back the Aux lane slots ---------------------------------
        aux_new = aux
        for k, v in new_cols.items():
            aux_new = jnp.where(aux_lane == k, v, aux_new)
        Aux[...] = aux_new

        return 0

    jax.lax.fori_loop(0, Tc, frame, 0)

    # carry the last far-end spectrum into the next chunk
    ZpR[...] = Zr[0, Tc - 1]
    ZpI[...] = Zi[0, Tc - 1]


def fused_aec(
    far: jnp.ndarray,
    x: jnp.ndarray,
    cfg=None,
    interpret: bool = None,
    t_chunk: int = None,
    sub: int = _SUB,
):
    """Fused AEC over a whole utterance: far [B, S] shared far-end,
    x [B, M, S] mics -> echo-free [B, M, S'] (aec_step semantics, batched
    over the mic axis exactly like runtime.full_stack).  B % sub == 0."""
    from distantspeech_tpu.adaptive.aec import AecConfig
    from distantspeech_tpu.adaptive.feature import emphasis_init, pre_emphasis

    if cfg is None:
        cfg = AecConfig(filter_len=512, num_block=2)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if x.ndim != 3 or x.shape[0] % sub:
        raise ValueError(f"fused_aec needs x [B, M, S] with B % {sub} == 0, got {x.shape}")
    if cfg.num_block not in (1, 2):
        raise ValueError("fused_aec supports num_block in (1, 2)")
    if cfg.non_causal:
        raise ValueError("fused_aec implements the causal (default) AEC")
    hop = cfg.block_len
    n_fft = cfg.n_fft
    fl = n_fft // 2
    if fl % 128:
        raise ValueError(f"fused_aec needs block_len % 128 == 0, got {hop}")
    if not (cfg.two_path and cfg.prop and cfg.constrain):
        raise ValueError("fused_aec implements the production two_path+prop+constrain AEC")
    if 7 * x.shape[1] > 128:
        # the Aux scratch packs 7 per-mic lane slots into one 128-lane tile
        raise ValueError(
            f"fused_aec supports at most 18 mics (7*M <= 128 aux lanes), got M={x.shape[1]}")
    B, M, Sx = x.shape
    T = Sx // hop
    x = x[..., : T * hop]
    far = far[..., : T * hop]
    nb = B // sub
    NB = cfg.num_block

    # pre-emphasis is input-only -> bulk (feature.py:14-21)
    _, farp = pre_emphasis(emphasis_init((B,), dtype=far.dtype), far)
    _, xp = pre_emphasis(emphasis_init((B, M), dtype=x.dtype), x)

    tc = t_chunk or _pick_t_chunk(T, 32) or 32
    Tp = -(-T // tc) * tc

    d_in = jnp.transpose(xp.reshape(B, M, T, hop), (2, 1, 0, 3))  # [T, M, B, hop]
    if Tp != T:
        d_in = jnp.pad(d_in, [(0, Tp - T), (0, 0), (0, 0), (0, 0)])
    d_in = d_in.reshape(Tp, M, nb, sub, hop).swapaxes(1, 2)

    farb = jnp.pad(farp, [(0, 0), (hop, 0)]).reshape(B, 1, T + 1, hop)
    if Tp != T:
        farb = jnp.pad(farb, [(0, 0), (0, 0), (0, Tp - T), (0, 0)])
    sig = jnp.transpose(farb, (2, 1, 0, 3))  # [Tp+1, 1, B, hop]

    CS, AB = (m.astype(np.float32) for m in plain_dft_packed(n_fft))
    win = cfg.window().astype(np.float32)[None, :].repeat(8, axis=0)  # [8, n_fft]
    R1, decay = _deemph_mats(hop, 0.98)
    r1 = np.concatenate([R1, decay[None, :]], axis=0).astype(np.float32)  # [hop+1, hop]

    kern = partial(
        _aec_kernel, Tc=tc, M=M, NB=NB, fl=fl, hop=hop, sub=sub,
        alpha=cfg.alpha, mu_max=cfg.mu_max, gamma=cfg.gamma, beta0=cfg.beta0,
    )
    sig_spec = pl.BlockSpec((tc, 1, sub, hop), lambda n, t: (t, 0, n, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, 1, sub, hop), lambda n, t: (t * tc + tc, 0, n, 0), memory_space=pltpu.VMEM)
    tile_m = pl.BlockSpec((tc, 1, M, sub, hop), lambda n, t: (t, n, 0, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda n, t: (0,) * len(shape), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((1, tc, sub, fl), jnp.float32),  # Zr
        pltpu.VMEM((1, tc, sub, fl), jnp.float32),  # Zi
        pltpu.VMEM((sub, fl), jnp.float32),  # ZpR
        pltpu.VMEM((sub, fl), jnp.float32),  # ZpI
        pltpu.VMEM((M * NB, sub, fl), jnp.float32),  # Wr
        pltpu.VMEM((M * NB, sub, fl), jnp.float32),  # Wi
        pltpu.VMEM((M * NB, sub, fl), jnp.float32),  # Fr
        pltpu.VMEM((M * NB, sub, fl), jnp.float32),  # Fi
        pltpu.VMEM((sub, fl), jnp.float32),  # P
        pltpu.VMEM((sub, fl), jnp.float32),  # PN
        pltpu.VMEM((M, sub, fl), jnp.float32),  # Py
        pltpu.VMEM((sub, 128), jnp.float32),  # PyN
        pltpu.VMEM((M, sub, fl), jnp.float32),  # Pe
        pltpu.VMEM((sub, 128), jnp.float32),  # PeN
        pltpu.VMEM((sub, 128), jnp.float32),  # Aux
    ]
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    o_out = pl.pallas_call(
        kern,
        grid=(nb, Tp // tc),
        in_specs=[sig_spec, halo_spec, tile_m, const(CS.shape), const(AB.shape),
                  const(win.shape), const(r1.shape)],
        out_specs=tile_m,
        out_shape=jax.ShapeDtypeStruct((Tp, nb, M, sub, hop), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        **({} if params is None else {"compiler_params": params}),
    )(sig, sig, d_in, jnp.asarray(CS), jnp.asarray(AB), jnp.asarray(win), jnp.asarray(r1))

    return jnp.transpose(o_out[:T], (1, 3, 2, 0, 4)).reshape(B, M, T * hop)
