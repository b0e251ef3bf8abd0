"""Fused overlap-save FLMS recursions for the GSC family, in ONE Pallas call.

Oracle: FastFreqLms.update (/root/reference/DistantSpeech/adaptivefilter/
FastFreqLms.py:202-286) driven per frame by TDGSC.process
(/root/reference/DistantSpeech/beamformer/TDGSC.py:110-172) and FDGSC.process
(FDGSC.py:201-317).

Why this exists: the scan-path TDGSC/FDGSC run ~35 audio-s/s on TPU because
each frame of the ``lax.scan`` issues 7 serial rdft/irdft MXU dispatches,
every one latency- (not throughput-) bound (benchmarks/profile_tdgsc.py,
docs/performance.md "serial-recursion floor").  This module applies the same
cure the flagship mega kernel used (ops/pallas_enhance.py): move the whole
frame loop inside one Pallas kernel, with every transform a dot against a
compile-time packed DFT matrix resident in VMEM.

Key structural observation that makes the kernel cheap: the FLMS *input*
spectra are input-only (buf_t = [x_{t-1}, x_t] does not depend on filter
state), so the analysis DFT of every frame batches into two bulk MXU dots
per chunk.  Only the genuinely recursive ops stay in the frame loop:

- W = w @ CS[:L]       (filter taps -> spectrum; state is TIME-domain taps,
                        which makes the gradient constraint and the CCAF /
                        fir_truncate clamps free lane masks)
- y = [Yr|Yi] @ AB[:, hop:]   (last hop of the inverse transform)
- E = e @ CS[hop:]     (front-zero-padded error spectrum)
- the gradient constraint round-trip (freq -> first-L time samples -> freq)
  only when a per-bin stepsize gate sits between constraint and update
  (TDGSC's 1-p MCRA gate); scalar-gated variants (FDGSC) skip it.

Spectral packing (identical to pallas_enhance): real plane = bins 0..F-2,
imag plane lane 0 = the (real-valued) Nyquist bin, so an n_fft-point real
DFT is exactly 2*(n_fft/2) = n_fft matmul columns with no padding waste.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distantspeech_tpu.ops.pallas_enhance import _SUB, _mcra_frame, _pick_t_chunk


@lru_cache(maxsize=None)
def plain_dft_packed(n_fft: int):
    """Packed plain (unwindowed) rDFT matrices.

    Returns (CS [n_fft, 2fl], AB [2fl, n_fft]) with fl = n_fft//2 and the
    packed column/row order [re 0..fl-1 | re Nyquist | im 1..fl-1] — the
    structurally-zero sin columns for k=0 and k=fl are dropped so the
    matmuls are exactly n_fft lanes wide (matches ops.dft numerics)."""
    fl = n_fft // 2
    F = fl + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(F)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    cos, sin = np.cos(ang), np.sin(ang)
    CS = np.concatenate([cos[:, :fl], cos[:, fl:], sin[:, 1:fl]], axis=1)

    kk = np.arange(F)[:, None]
    tt = np.arange(n_fft)[None, :]
    ang2 = 2.0 * np.pi * kk * tt / n_fft
    scale = np.full((F, 1), 2.0)
    scale[0] = 1.0
    scale[-1] = 1.0
    A = np.cos(ang2) * scale / n_fft
    Bm = -np.sin(ang2) * scale / n_fft
    AB = np.concatenate([A[:fl], A[fl:], Bm[1:fl]], axis=0)
    return CS, AB  # float64; callers cast to the compute dtype


def _cmul_acc(xr, xi, wr, wi, mask0):
    """Packed complex product: lanes 1.. are ordinary bins; lane 0 of the
    imag plane carries the Nyquist (real x real) product, lane 0 of the real
    plane bin 0 (whose imag part is identically 0)."""
    yr = xr * wr - jnp.where(mask0, 0.0, xi * wi)
    yi = jnp.where(mask0, xi * wi, xr * wi + xi * wr)
    return yr, yi


def _cmul_conj(xr, xi, er, ei, mask0):
    """Packed conj(X) * E."""
    gr = xr * er + jnp.where(mask0, 0.0, xi * ei)
    gi = jnp.where(mask0, xi * ei, xr * ei - xi * er)
    return gr, gi


def _dot(a, b):
    return jnp.dot(a, b, precision="highest", preferred_element_type=jnp.float32)


def _bulk_analysis(sig_ref, halo_ref, cs_ref, Zr, Zi, C, Tc, sub, hop, fl):
    """X_t = b_{t-1} @ CS[:hop] + b_t @ CS[hop:] for every frame of the
    chunk in two MXU dots per channel (the FLMS buffer is input-only)."""
    for c in range(C):
        a1 = sig_ref[:, c]  # [Tc, sub, hop] = blocks t-1 (pre-padded)
        a2 = jnp.concatenate([a1[1:], halo_ref[:, c]], axis=0)
        z = _dot(a1.reshape(Tc * sub, hop), cs_ref[:hop])
        z = z + _dot(a2.reshape(Tc * sub, hop), cs_ref[hop:])
        z = z.reshape(Tc, sub, 2 * fl)
        Zr[c] = z[:, :, :fl]
        Zi[c] = z[:, :, fl:]


def _flms_gated_frame(
    t, Zr, Zi, Wt, Pm, Pn, cs_ref, ab_ref, d_t, gate_r, gate_i, mask0, edge,
    C, sub, fl, hop, Lf, mu, alpha,
):
    """One frame of the non-causal, fir_truncated, per-bin-gated FLMS AIC
    (FastFreqLms.update, FastFreqLms.py:202-286, as driven by TDGSC.py:150):
    6 small in-VMEM dots, tap-space filter state.  Returns e [sub, hop]."""
    Wz = _dot(Wt[...].reshape(C * sub, Lf), cs_ref[:Lf]).reshape(C, sub, 2 * fl)

    Yr = jnp.zeros((sub, fl), jnp.float32)
    Yi = jnp.zeros((sub, fl), jnp.float32)
    pw = jnp.zeros((sub, fl), jnp.float32)
    pwn = jnp.zeros((sub, fl), jnp.float32)
    for c in range(C):
        xr, xi = Zr[c, t], Zi[c, t]
        yr, yi = _cmul_acc(xr, xi, Wz[c, :, :fl], Wz[c, :, fl:], mask0)
        Yr, Yi = Yr + yr, Yi + yi
        pw = pw + xr * xr + jnp.where(mask0, 0.0, xi * xi)
        pwn = pwn + xi * xi
    # power recursion with the stored clamp (FastFreqLms.py:189)
    Pmc = jnp.maximum(alpha * Pm[...] + (1.0 - alpha) * pw, 1e-4)
    Pnc = jnp.maximum(alpha * Pn[...] + (1.0 - alpha) * pwn, 1e-4)
    Pm[...] = Pmc
    Pn[...] = Pnc

    y = _dot(jnp.concatenate([Yr, Yi], axis=-1), ab_ref[:, hop:])
    e = d_t - y

    Ez = _dot(e, cs_ref[hop:])  # rdft of front-zero-padded error
    Er, Ei = Ez[:, :fl], Ez[:, fl:]
    Pdi = jnp.where(mask0, Pnc, Pmc)

    G = []
    for c in range(C):
        xr, xi = Zr[c, t], Zi[c, t]
        gr, gi = _cmul_conj(xr, xi, Er, Ei, mask0)
        G.append(jnp.concatenate([gr / Pmc, gi / Pdi], axis=-1))
    Gflat = jnp.concatenate(G, axis=0)  # [C*sub, 2fl]

    # gradient constraint (FastFreqLms.py:194-200): keep the first
    # n_fft - hop = Lf time samples, then regate per-bin and return to
    # time for the update (fir_truncate makes the Lf-tap truncation of
    # the update exact: W is re-derived from w[:Lf] every frame)
    g_t = _dot(Gflat, ab_ref[:, :Lf])
    Gc = _dot(g_t, cs_ref[:Lf]).reshape(C, sub, 2 * fl)
    U = [
        jnp.concatenate([Gc[c, :, :fl] * gate_r, Gc[c, :, fl:] * gate_i], axis=-1)
        for c in range(C)
    ]
    u = _dot(jnp.concatenate(U, axis=0), ab_ref[:, :Lf])  # [C*sub, Lf]
    w_new = Wt[...].reshape(C * sub, Lf) + 2.0 * mu * u
    Wt[...] = jnp.where(edge, w_new, 0.0).reshape(C, sub, Lf)
    return e


def _tdgsc_kernel(
    sig_ref, halo_ref, d_ref, yp_ref, sf_ref, cs_ref, ab_ref,  # inputs
    e_ref, p_ref,  # outputs
    Zr, Zi, Wt, Pm, Pn, S, Smin, Stmp, Pp, Lam,  # scratch
    *, Tc: int, C: int, fl: int, hop: int, Lf: int, ft: int,
    mu: float, alpha: float, sub: int,
    L: int, alpha_s: float, alpha_p: float, alpha_d: float, delta_s: float,
    p_min: float, p_max: float, unroll: int = 1, _stages: int = 7,
    vad_guard: bool = False,
):
    """TDGSC core: in-VMEM MCRA on the FBF spectrum gates a non-causal
    multichannel FLMS canceller (TDGSC.py:110-172 + FastFreqLms.py:202-286).

    Per frame: 6 small MXU dots (W, y, E, constraint round-trip, gated
    update), all against VMEM-resident packed DFT constants; filter state is
    time-domain taps w [C, sub, Lf] so the gradient constraint and
    fir_truncate are lane masks."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (Wt, Pm, Pn, S, Smin, Stmp, Pp, Lam):
            ref[...] = jnp.zeros_like(ref)

    _bulk_analysis(sig_ref, halo_ref, cs_ref, Zr, Zi, C, Tc, sub, hop, fl)

    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, fl), 1)
    interior = lane >= 1
    mask0 = lane == 0
    tlane = jax.lax.broadcasted_iota(jnp.int32, (C * sub, Lf), 1)
    edge = (tlane >= ft) & (tlane < Lf - ft)  # fir_truncate (TDGSC.py:107)
    chunk_base = pl.program_id(1) * Tc

    def frame(t, _):
        tg = chunk_base + t
        p_out, _, sr = _mcra_frame(
            tg, yp_ref[t, 0], sf_ref[t, 0], S, Smin, Stmp, Pp, Lam, interior,
            mask0, L=L, alpha_s=alpha_s, alpha_p=alpha_p, alpha_d=alpha_d,
            delta_s=delta_s, p_min=p_min, p_max=p_max,
        )
        gate_r = 1.0 - p_out  # per-bin stepsize (TDGSC.py:150)
        if vad_guard:
            # TdGscConfig.vad_guard: freeze the canceller where the RAW
            # S/Smin indicator says speech (the scan path's edge bins never
            # update S, so their guard is always open — matched here by the
            # mask0/Nyquist overrides)
            gate_r = gate_r * (sr <= delta_s)
        gate_i = jnp.where(mask0, 1.0 - p_min, gate_r)  # Nyquist p pinned
        p_ref[t, 0] = p_out
        if not _stages & 1:  # profiling: MCRA only
            e_ref[t, 0] = d_ref[t, 0] + p_out[:, :hop]
            return 0
        e = _flms_gated_frame(
            t, Zr, Zi, Wt, Pm, Pn, cs_ref, ab_ref, d_ref[t, 0], gate_r, gate_i,
            mask0, edge, C, sub, fl, hop, Lf, mu, alpha,
        )
        e_ref[t, 0] = e
        return 0

    jax.lax.fori_loop(0, Tc, frame, 0, unroll=unroll)


def fused_tdgsc(
    x: jnp.ndarray,
    geometry,
    angle_rad=(197.0 / 180.0 * np.pi, 0.0),
    cfg=None,
    interpret: bool = None,
    t_chunk: int = None,
    sub: int = _SUB,
    unroll: int = 1,
    _stages: int = 7,
):
    """Fused TDGSC (cfg.postfilter selects the OMLSA-in-kernel variant):
    same signature/returns as
    ``beamform.tdgsc.tdgsc_process`` — (out [B, S'], p [B, T, F],
    bm [B, M-1, S']).  x: [B, M, S] with B % sub == 0.

    Matches the scan path to float32 rounding (the scan path is itself
    parity-tested against TDGSC.process)."""
    from distantspeech_tpu.adaptive.feature import dc_notch, dc_notch_init
    from distantspeech_tpu.array.alignment import time_alignment_filters
    from distantspeech_tpu.beamform.tdgsc import TdGscConfig
    from distantspeech_tpu.noise.mcra import _freq_smooth
    from distantspeech_tpu.ops.fir import fir_filter_offline
    from distantspeech_tpu.transform.stft import stft_frames

    if cfg is None:
        cfg = TdGscConfig()
    if interpret is None:  # Mosaic only exists on TPU; interpret elsewhere
        interpret = jax.devices()[0].platform != "tpu"
    if x.ndim != 3 or x.shape[0] % sub:
        raise ValueError(f"fused_tdgsc needs x [B, M, S] with B % {sub} == 0, got {x.shape}")
    acfg = cfg.aic
    Lf, hop, n_fft = acfg.filter_len, acfg.hop, acfg.n_fft
    fl = n_fft // 2
    if fl % 128 or hop != Lf or n_fft != 2 * Lf:
        raise ValueError(f"fused_tdgsc needs the default hop == filter_len, n_fft == 2L layout with n_fft % 256 == 0 (got L={Lf}, hop={hop}, n_fft={n_fft})")
    B, M, Sx = x.shape
    C = M - 1
    T = Sx // Lf
    x = x[..., : T * Lf]
    nb = B // sub
    mc = cfg.mcra

    # ---- whole-utterance preprocessing (frame-independent, XLA bulk) -------
    _, xn = dc_notch(dc_notch_init(x.shape[:-1], dtype=x.dtype), x, radius=0.98)
    coeffs = jnp.asarray(np.asarray(time_alignment_filters(geometry, angle_rad)), dtype=x.dtype)
    aligned = fir_filter_offline(xn, coeffs)
    fbf = jnp.mean(aligned, axis=-2)  # [B, S]
    bm = aligned[..., :-1, :] - aligned[..., 1:, :]  # [B, C, S]

    # MCRA inputs: windowed STFT power of the FBF (input-only -> bulk)
    fbf_pad = jnp.pad(fbf, [(0, 0), (cfg.stft.overlap, 0)])
    D = stft_frames(fbf_pad, cfg.stft)  # [B, T, F]
    power = jnp.real(D) ** 2 + jnp.imag(D) ** 2
    Sf = _freq_smooth(power, mc.b)[..., :fl]
    Yp = power[..., :fl]

    # non-causal desired: FBF delayed by filter_len/2 (FastFreqLms.py:87-89)
    dly = Lf // 2
    d = jnp.pad(fbf, [(0, 0), (dly, 0)])[..., : T * Lf]

    tc = t_chunk or _pick_t_chunk(T, 32) or 32
    Tp = -(-T // tc) * tc

    def to_tiles(a, last):  # [B, T(,F)] -> [Tp, nb, sub, last]
        a = a.reshape(B, T, last) if a.ndim == 2 else a
        a = jnp.moveaxis(a, 1, 0)  # [T, B, last]
        if Tp != T:
            a = jnp.pad(a, [(0, Tp - T), (0, 0), (0, 0)])
        return a.reshape(Tp, nb, sub, last)

    d_in = to_tiles(d.reshape(B, T, Lf), Lf)
    yp_in = to_tiles(Yp, fl)
    sf_in = to_tiles(Sf, fl)

    # FLMS input blocks, pre-padded one hop (buf_t = [b_{t-1}, b_t])
    bmp = jnp.pad(bm, [(0, 0), (0, 0), (hop, 0)]).reshape(B, C, T + 1, hop)
    if Tp != T:
        bmp = jnp.pad(bmp, [(0, 0), (0, 0), (0, Tp - T), (0, 0)])
    sig = jnp.transpose(bmp, (2, 1, 0, 3))  # [Tp+1, C, B, hop]

    CS, AB = (m.astype(np.float32) for m in plain_dft_packed(n_fft))

    kern = partial(
        _tdgsc_kernel, Tc=tc, C=C, fl=fl, hop=hop, Lf=Lf, ft=cfg.fir_truncate,
        mu=acfg.mu, alpha=acfg.alpha, sub=sub,
        L=mc.L, alpha_s=mc.alpha_s, alpha_p=mc.alpha_p, alpha_d=mc.alpha_d,
        delta_s=mc.delta_s, p_min=mc.p_min, p_max=mc.p_max,
        unroll=(tc if unroll == "full" else int(unroll)), _stages=_stages,
        vad_guard=cfg.vad_guard,
    )
    sig_spec = pl.BlockSpec((tc, C, sub, hop), lambda n, t: (t, 0, n, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, C, sub, hop), lambda n, t: (t * tc + tc, 0, n, 0), memory_space=pltpu.VMEM)
    tile = lambda last: pl.BlockSpec((tc, 1, sub, last), lambda n, t: (t, n, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda n, t: (0, 0), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((C, tc, sub, fl), jnp.float32),  # Zr
        pltpu.VMEM((C, tc, sub, fl), jnp.float32),  # Zi
        pltpu.VMEM((C, sub, Lf), jnp.float32),  # Wt
    ] + [pltpu.VMEM((sub, fl), jnp.float32)] * 7  # Pm, Pn, S, Smin, Stmp, Pp, Lam
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )

    if cfg.postfilter:
        # OMLSA-multi fused in: windowed BM reference powers ride in as bulk
        # inputs; the beam spectrum, (1+C) MCRA trackers, TBRR gain and the
        # windowed ISTFT run in-loop (_tdgsc_pf_kernel)
        Ubm = stft_frames(jnp.pad(bm, [(0, 0), (0, 0), (cfg.stft.overlap, 0)]), cfg.stft)
        u_pow = jnp.real(Ubm) ** 2 + jnp.imag(Ubm) ** 2  # [B, C, T, F]
        up = jnp.transpose(u_pow[..., :fl], (2, 1, 0, 3))  # [T, C, B, fl]
        if Tp != T:
            up = jnp.pad(up, [(0, Tp - T), (0, 0), (0, 0), (0, 0)])
        up_in = up.reshape(Tp, C, nb, sub, fl).swapaxes(1, 2)  # [Tp, nb, C, sub, fl]
        un = jnp.moveaxis(u_pow[..., fl], -1, 0)  # [T, B, C] Nyquist powers
        un = jnp.pad(un, [(0, Tp - T), (0, 0), (0, 0)]) if Tp != T else un
        un_in = jnp.pad(un.reshape(Tp, nb, sub, C), [(0, 0)] * 3 + [(0, fl - C)])

        CSW, ABW = (m.astype(np.float32) for m in windowed_dft_packed(cfg.stft.n_fft, cfg.stft.hop))
        om = cfg.omlsa
        omc = om.mcra
        pf_kern = partial(
            _tdgsc_pf_kernel, Tc=tc, C=C, fl=fl, hop=hop, Lf=Lf, ft=cfg.fir_truncate,
            mu=acfg.mu, alpha=acfg.alpha, sub=sub,
            L=mc.L, alpha_s=mc.alpha_s, alpha_p=mc.alpha_p, alpha_d=mc.alpha_d,
            delta_s=mc.delta_s, p_min=mc.p_min, p_max=mc.p_max,
            om_L=omc.L, om_alpha_s=omc.alpha_s, om_alpha_p=omc.alpha_p,
            om_alpha_d=omc.alpha_d, om_delta_s=omc.delta_s, om_p_min=omc.p_min,
            om_p_max=omc.p_max,
            o_alpha_s=om.alpha_s, o_alpha_d=om.alpha_d, o_alpha_xi=om.alpha_xi,
            o_beta=om.beta, o_bmin=om.Bmin, o_eps=om.eps_tbrr, o_gh=om.gamma_high,
            o_gl=om.gamma_low, o_oh=om.omega_high, o_ol=om.omega_low,
            o_qmin=om.q_min, o_qmax=om.q_max, o_gmin=om.gmin,
            vad_guard=cfg.vad_guard,
        )
        up_spec = pl.BlockSpec((tc, 1, C, sub, fl), lambda n, t: (t, n, 0, 0, 0), memory_space=pltpu.VMEM)
        Mch = 1 + C
        pf_scratch = scratch + [
            pltpu.VMEM((Mch, sub, fl), jnp.float32),  # McS
            pltpu.VMEM((Mch, sub, fl), jnp.float32),  # McSmin
            pltpu.VMEM((Mch, sub, fl), jnp.float32),  # McStmp
            pltpu.VMEM((Mch, sub, fl), jnp.float32),  # McP
            pltpu.VMEM((Mch, sub, fl), jnp.float32),  # McLam
            pltpu.VMEM((sub, fl), jnp.float32),  # ZetaY
            pltpu.VMEM((C, sub, fl), jnp.float32),  # ZetaU
            pltpu.VMEM((sub, fl), jnp.float32),  # OLam
            pltpu.VMEM((sub, fl), jnp.float32),  # OGam
            pltpu.VMEM((sub, fl), jnp.float32),  # OGH1
            pltpu.VMEM((sub, 128), jnp.float32),  # NyS
            pltpu.VMEM((sub, hop), jnp.float32),  # OutPrev
            pltpu.VMEM((sub, hop), jnp.float32),  # OLAc
        ]
        e_out, p_out = pl.pallas_call(
            pf_kern,
            grid=(nb, Tp // tc),
            in_specs=[sig_spec, halo_spec, tile(Lf), tile(fl), tile(fl), up_spec, tile(fl),
                      const(CS.shape), const(AB.shape), const(CSW.shape), const(ABW.shape)],
            out_specs=[tile(hop), tile(fl)],
            out_shape=[
                jax.ShapeDtypeStruct((Tp, nb, sub, hop), jnp.float32),
                jax.ShapeDtypeStruct((Tp, nb, sub, fl), jnp.float32),
            ],
            scratch_shapes=pf_scratch,
            interpret=interpret,
            **({} if params is None else {"compiler_params": params}),
        )(sig, sig, d_in, yp_in, sf_in, up_in, un_in,
          jnp.asarray(CS), jnp.asarray(AB), jnp.asarray(CSW), jnp.asarray(ABW))
    else:
        e_out, p_out = pl.pallas_call(
            kern,
            grid=(nb, Tp // tc),
            in_specs=[sig_spec, halo_spec, tile(Lf), tile(fl), tile(fl), const(CS.shape), const(AB.shape)],
            out_specs=[tile(hop), tile(fl)],
            out_shape=[
                jax.ShapeDtypeStruct((Tp, nb, sub, hop), jnp.float32),
                jax.ShapeDtypeStruct((Tp, nb, sub, fl), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
            **({} if params is None else {"compiler_params": params}),
        )(sig, sig, d_in, yp_in, sf_in, jnp.asarray(CS), jnp.asarray(AB))

    out = jnp.moveaxis(e_out[:T].reshape(T, B, Lf), 0, 1).reshape(B, T * Lf)
    p_main = jnp.moveaxis(p_out[:T].reshape(T, B, fl), 0, 1)  # [B, T, fl]
    p_full = jnp.concatenate(
        [p_main, jnp.full((*p_main.shape[:-1], 1), mc.p_min, p_main.dtype)], axis=-1
    )
    return out, p_full, bm


def _fdgsc_kernel(
    sig_ref, halo_ref, dbm_ref, daic_ref, yp_ref, sf_ref, cs_ref, ab_ref, ub_ref,  # inputs
    e_ref, p_ref, bm_ref,  # outputs
    Zr, Zi, Wbm, Waic, Pbm, Pnbm, Paic, Pnaic, Eprev, S, Smin, Stmp, Pp, Lam,  # scratch
    *, Tc: int, M: int, fl: int, hop: int, Lf: int,
    mu_bm: float, mu_aic: float, alpha: float, maxnorm: float, sub: int,
    L: int, alpha_s: float, alpha_p: float, alpha_d: float, delta_s: float,
    p_min: float, p_max: float,
):
    """FDGSC core (FDGSC.py:201-317): per-frame MCRA(L=60) on the raw
    reference channel with the returned-p low-bin pinning quirk
    (:241-253), M CCAF-clamped single-channel BM FLMS filters sharing the
    FBF spectrum (:255-262, p=1), and a norm-constrained multichannel AIC
    FLMS stepped by the scalar 1 - mean(p_ret) (:275-281).

    Filter state is time-domain taps, so the BM clamp (gsc_bm.py:92-106),
    the last-hop zeroing and the AIC norm ceiling (gsc_aic.py:84-97,
    computed exactly from the full-support update via Parseval) are
    VPU-side ops; the per-frame transforms are 9 small in-VMEM dots."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (Wbm, Waic, Pbm, Pnbm, Paic, Pnaic, Eprev, S, Smin, Stmp, Pp, Lam):
            ref[...] = jnp.zeros_like(ref)

    # FBF spectra for every frame of the chunk (input-only)
    _bulk_analysis(sig_ref, halo_ref, cs_ref, Zr, Zi, 1, Tc, sub, hop, fl)

    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, fl), 1)
    interior = lane >= 1
    mask0 = lane == 0
    low32 = lane < 32
    mid = (lane >= 32) & (lane < 128)
    sgn = 1.0 - 2.0 * (jax.lax.broadcasted_iota(jnp.int32, (sub, Lf), 1) % 2).astype(jnp.float32)
    chunk_base = pl.program_id(1) * Tc

    def frame(t, _):
        tg = chunk_base + t
        p_out, _, _ = _mcra_frame(
            tg, yp_ref[t, 0], sf_ref[t, 0], S, Smin, Stmp, Pp, Lam, interior,
            mask0, L=L, alpha_s=alpha_s, alpha_p=alpha_p, alpha_d=alpha_d,
            delta_s=delta_s, p_min=p_min, p_max=p_max,
        )
        # returned-p mutation (FDGSC.py:249-253): pin the low 32 bins when
        # the 32..127 mid-band mean exceeds 0.8
        mid_mean = jnp.sum(jnp.where(mid, p_out, 0.0), axis=1, keepdims=True) / 96.0
        p_ret = jnp.where(low32 & (mid_mean > 0.8), jnp.maximum(p_out, 0.8), p_out)
        p_ref[t, 0] = p_ret
        # AIC stepsize: 1 - mean over ALL half_bin bins incl. the Nyquist
        # p (pinned at p_min, held in the companion column outside)
        gate = 1.0 - (jnp.sum(p_ret, axis=1, keepdims=True) + p_min) / float(fl + 1)

        xr, xi = Zr[0, t], Zi[0, t]
        ypow = xr * xr + jnp.where(mask0, 0.0, xi * xi)
        Pbm_c = jnp.maximum(alpha * Pbm[...] + (1.0 - alpha) * ypow, 1e-4)
        Pnbm_c = jnp.maximum(alpha * Pnbm[...] + (1.0 - alpha) * xi * xi, 1e-4)
        Pbm[...] = Pbm_c
        Pnbm[...] = Pnbm_c
        Pbm_i = jnp.where(mask0, Pnbm_c, Pbm_c)

        # ---- blocking matrix: M single-channel FLMS sharing X ------------
        Wz = _dot(Wbm[...].reshape(M * sub, Lf), cs_ref[:Lf]).reshape(M, sub, 2 * fl)
        Ybm = []
        for m in range(M):
            yr, yi = _cmul_acc(xr, xi, Wz[m, :, :fl], Wz[m, :, fl:], mask0)
            Ybm.append(jnp.concatenate([yr, yi], axis=-1))
        y_bm = _dot(jnp.concatenate(Ybm, axis=0), ab_ref[:, hop:]).reshape(M, sub, hop)
        e_bm = dbm_ref[t, 0] - y_bm  # [M, sub, hop] — the BM output
        bm_ref[t, 0] = e_bm

        Ez = _dot(e_bm.reshape(M * sub, hop), cs_ref[hop:]).reshape(M, sub, 2 * fl)
        G = []
        for m in range(M):
            gr, gi = _cmul_conj(xr, xi, Ez[m, :, :fl], Ez[m, :, fl:], mask0)
            G.append(jnp.concatenate([gr / Pbm_c, gi / Pbm_i], axis=-1))
        g_t = _dot(jnp.concatenate(G, axis=0), ab_ref[:, :Lf]).reshape(M, sub, Lf)
        # W += mu*grad (p=1, gsc_bm.py:90), then the CCAF clamp on the first
        # n_fft/2 taps + last-hop zeroing — pure tap-space ops here
        Wbm[...] = jnp.clip(Wbm[...] + mu_bm * g_t, -0.001, ub_ref[...])

        # ---- AIC: multichannel FLMS on the BM outputs --------------------
        # state-dependent input: buf_m = [e_prev_m, e_bm_m]
        a1 = Eprev[...].reshape(M * sub, hop)
        a2 = e_bm.reshape(M * sub, hop)
        Za = (_dot(a1, cs_ref[:hop]) + _dot(a2, cs_ref[hop:])).reshape(M, sub, 2 * fl)
        Eprev[...] = e_bm

        pw = jnp.zeros((sub, fl), jnp.float32)
        pwn = jnp.zeros((sub, fl), jnp.float32)
        Wza = _dot(Waic[...].reshape(M * sub, Lf), cs_ref[:Lf]).reshape(M, sub, 2 * fl)
        Yr = jnp.zeros((sub, fl), jnp.float32)
        Yi = jnp.zeros((sub, fl), jnp.float32)
        for m in range(M):
            ar, ai = Za[m, :, :fl], Za[m, :, fl:]
            yr, yi = _cmul_acc(ar, ai, Wza[m, :, :fl], Wza[m, :, fl:], mask0)
            Yr, Yi = Yr + yr, Yi + yi
            pw = pw + ar * ar + jnp.where(mask0, 0.0, ai * ai)
            pwn = pwn + ai * ai
        Paic_c = jnp.maximum(alpha * Paic[...] + (1.0 - alpha) * pw, 1e-4)
        Pnaic_c = jnp.maximum(alpha * Pnaic[...] + (1.0 - alpha) * pwn, 1e-4)
        Paic[...] = Paic_c
        Pnaic[...] = Pnaic_c
        Paic_i = jnp.where(mask0, Pnaic_c, Paic_c)

        y = _dot(jnp.concatenate([Yr, Yi], axis=-1), ab_ref[:, hop:])
        e = daic_ref[t, 0] - y
        e_ref[t, 0] = e

        Eza = _dot(e, cs_ref[hop:])
        Er, Ei = Eza[:, :fl], Eza[:, fl:]
        Ga = []
        for m in range(M):
            ar, ai = Za[m, :, :fl], Za[m, :, fl:]
            gr, gi = _cmul_conj(ar, ai, Er, Ei, mask0)
            Ga.append(jnp.concatenate([gr / Paic_c, gi / Paic_i], axis=-1))
        # full-support time gradient: the norm ceiling needs the HALF-
        # spectrum power of the UPDATED, unconstrained filter
        # (gsc_aic.py:84-97); via Parseval on the full 2L support:
        # sum_half |W_k|^2 = (n_fft*sum_n w_n^2 + W_0^2 + W_Nyq^2) / 2
        gt_full = _dot(jnp.concatenate(Ga, axis=0), ab_ref[...]).reshape(M, sub, 2 * Lf)
        w_upd_head = Waic[...] + (mu_aic * gate)[None, :, :] * gt_full[:, :, :Lf]
        w_upd_tail = (mu_aic * gate)[None, :, :] * gt_full[:, :, Lf:]
        ssq = jnp.sum(w_upd_head * w_upd_head, axis=(0, 2)) + jnp.sum(w_upd_tail * w_upd_tail, axis=(0, 2))  # [sub]
        w0 = jnp.sum(w_upd_head, axis=(0, 2)) + jnp.sum(w_upd_tail, axis=(0, 2))
        wn = jnp.sum(w_upd_head * sgn[None], axis=(0, 2)) + jnp.sum(w_upd_tail * sgn[None], axis=(0, 2))
        n_fft = 2.0 * Lf
        norm = ((n_fft * ssq + w0 * w0 + wn * wn) / 2.0) / n_fft / n_fft  # [sub]
        scale = jnp.where(norm > maxnorm, jnp.sqrt(maxnorm / jnp.maximum(norm, 1e-30)), 1.0)
        Waic[...] = w_upd_head * scale[None, :, None]
        return 0

    jax.lax.fori_loop(0, Tc, frame, 0)


def fused_fdgsc(
    x: jnp.ndarray,
    geometry,
    angle_rad=(197.0 / 180.0 * np.pi, 0.0),
    cfg=None,
    dc_notch_input: bool = True,
    interpret: bool = None,
    t_chunk: int = None,
    sub: int = _SUB,
):
    """Fused FDGSC: same signature/returns as ``beamform.fdgsc.fdgsc_process``
    — (out [B, S'], p [B, T, F], bm [B, M, S']).  x: [B, M, S], B % sub == 0."""
    from distantspeech_tpu.adaptive.feature import dc_notch, dc_notch_init
    from distantspeech_tpu.array.alignment import time_alignment_filters
    from distantspeech_tpu.beamform.fdgsc import FdGscConfig
    from distantspeech_tpu.beamform.gsc_filters import bm_bounds
    from distantspeech_tpu.noise.mcra import _freq_smooth
    from distantspeech_tpu.ops.fir import fir_filter_offline
    from distantspeech_tpu.transform.stft import stft_frames

    if cfg is None:
        cfg = FdGscConfig()
    if cfg.postfilter:
        raise ValueError("fused_fdgsc implements the postfilter=False core")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if x.ndim != 3 or x.shape[0] % sub:
        raise ValueError(f"fused_fdgsc needs x [B, M, S] with B % {sub} == 0, got {x.shape}")
    Lf = cfg.frame_len
    hop, n_fft = Lf, 2 * Lf
    fl = n_fft // 2
    if fl % 128:
        raise ValueError(f"fused_fdgsc needs frame_len % 128 == 0, got {Lf}")
    B, M, Sx = x.shape
    T = Sx // Lf
    x = x[..., : T * Lf]
    nb = B // sub
    mc = cfg.mcra

    if dc_notch_input:
        _, x = dc_notch(dc_notch_init(x.shape[:-1], dtype=x.dtype), x, radius=0.98)
    coeffs = jnp.asarray(np.asarray(time_alignment_filters(geometry, angle_rad)), dtype=x.dtype)
    aligned = fir_filter_offline(x, coeffs)
    fbf = jnp.mean(aligned, axis=-2)

    # MCRA input: windowed STFT power of the RAW (notched) reference channel
    x0_pad = jnp.pad(x[:, 0], [(0, 0), (cfg.stft.overlap, 0)])
    D = stft_frames(x0_pad, cfg.stft)
    power = jnp.real(D) ** 2 + jnp.imag(D) ** 2
    Sf = _freq_smooth(power, mc.b)[..., :fl]
    Yp = power[..., :fl]

    # causality delays (FDGSC.py:92-95): aligned by L/2, FBF by L
    aligned_d = jnp.pad(aligned, [(0, 0), (0, 0), (Lf // 2, 0)])[..., : T * Lf]
    fbf_d = jnp.pad(fbf, [(0, 0), (Lf, 0)])[..., : T * Lf]

    tc = t_chunk or _pick_t_chunk(T, 16) or 16
    Tp = -(-T // tc) * tc

    def tiles3(a, last):  # [B, T, last] -> [Tp, nb, sub, last]
        a = jnp.moveaxis(a, 1, 0)
        if Tp != T:
            a = jnp.pad(a, [(0, Tp - T), (0, 0), (0, 0)])
        return a.reshape(Tp, nb, sub, last)

    def tiles4(a):  # [B, M, T, hop] -> [Tp, nb, M, sub, hop]
        a = jnp.transpose(a, (2, 1, 0, 3))  # [T, M, B, hop]
        if Tp != T:
            a = jnp.pad(a, [(0, Tp - T), (0, 0), (0, 0), (0, 0)])
        return a.reshape(Tp, M, nb, sub, hop).swapaxes(1, 2)

    dbm_in = tiles4(aligned_d.reshape(B, M, T, Lf))
    daic_in = tiles3(fbf_d.reshape(B, T, Lf), Lf)
    yp_in = tiles3(Yp, fl)
    sf_in = tiles3(Sf, fl)

    fbfp = jnp.pad(fbf, [(0, 0), (hop, 0)]).reshape(B, 1, T + 1, hop)
    if Tp != T:
        fbfp = jnp.pad(fbfp, [(0, 0), (0, 0), (0, Tp - T), (0, 0)])
    sig = jnp.transpose(fbfp, (2, 1, 0, 3))  # [Tp+1, 1, B, hop]

    CS, AB = (m.astype(np.float32) for m in plain_dft_packed(n_fft))
    ub = np.broadcast_to(bm_bounds(n_fft).astype(np.float32), (M, sub, Lf)).copy()

    bm_cfg, aic_cfg = cfg.bm, cfg.aic
    kern = partial(
        _fdgsc_kernel, Tc=tc, M=M, fl=fl, hop=hop, Lf=Lf,
        mu_bm=bm_cfg.mu, mu_aic=aic_cfg.mu, alpha=bm_cfg.alpha, maxnorm=0.003, sub=sub,
        L=mc.L, alpha_s=mc.alpha_s, alpha_p=mc.alpha_p, alpha_d=mc.alpha_d,
        delta_s=mc.delta_s, p_min=mc.p_min, p_max=mc.p_max,
    )
    sig_spec = pl.BlockSpec((tc, 1, sub, hop), lambda n, t: (t, 0, n, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, 1, sub, hop), lambda n, t: (t * tc + tc, 0, n, 0), memory_space=pltpu.VMEM)
    tile = lambda last: pl.BlockSpec((tc, 1, sub, last), lambda n, t: (t, n, 0, 0), memory_space=pltpu.VMEM)
    tile_m = pl.BlockSpec((tc, 1, M, sub, hop), lambda n, t: (t, n, 0, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda n, t: (0,) * len(shape), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((1, tc, sub, fl), jnp.float32),  # Zr (fbf)
        pltpu.VMEM((1, tc, sub, fl), jnp.float32),  # Zi
        pltpu.VMEM((M, sub, Lf), jnp.float32),  # Wbm
        pltpu.VMEM((M, sub, Lf), jnp.float32),  # Waic
    ] + [pltpu.VMEM((sub, fl), jnp.float32)] * 4 + [
        pltpu.VMEM((M, sub, hop), jnp.float32),  # Eprev
    ] + [pltpu.VMEM((sub, fl), jnp.float32)] * 5
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    e_out, p_out, bm_out = pl.pallas_call(
        kern,
        grid=(nb, Tp // tc),
        in_specs=[sig_spec, halo_spec, tile_m, tile(Lf), tile(fl), tile(fl),
                  const(CS.shape), const(AB.shape), const(ub.shape)],
        out_specs=[tile(hop), tile(fl), tile_m],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, nb, sub, hop), jnp.float32),
            jax.ShapeDtypeStruct((Tp, nb, sub, fl), jnp.float32),
            jax.ShapeDtypeStruct((Tp, nb, M, sub, hop), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        **({} if params is None else {"compiler_params": params}),
    )(sig, sig, dbm_in, daic_in, yp_in, sf_in, jnp.asarray(CS), jnp.asarray(AB), jnp.asarray(ub))

    out = jnp.moveaxis(e_out[:T].reshape(T, B, Lf), 0, 1).reshape(B, T * Lf)
    p_main = jnp.moveaxis(p_out[:T].reshape(T, B, fl), 0, 1)
    p_full = jnp.concatenate(
        [p_main, jnp.full((*p_main.shape[:-1], 1), mc.p_min, p_main.dtype)], axis=-1
    )
    bm = jnp.transpose(bm_out[:T], (1, 3, 2, 0, 4)).reshape(B, M, T * Lf)
    return out, p_full, bm


@lru_cache(maxsize=None)
def windowed_dft_packed(n_fft: int, hop: int, fold_gain: bool = True):
    """Packed sqrt-hann windowed analysis/synthesis matrices in the same
    [re 0..fl-1 | re Nyquist | im 1..fl-1] layout as ``plain_dft_packed``
    (exactly transform.stft's matrices, column/row-packed).  With
    ``fold_gain`` the hop/W0 synthesis scale is folded into ABW — linear,
    so scaling frames before overlap-add equals scaling after."""
    from distantspeech_tpu.transform.stft import StftConfig, _dft_matrices, _idft_matrices

    cfg = StftConfig(n_fft, hop)
    fl = n_fft // 2
    C, Sn = _dft_matrices(cfg)
    CSW = np.concatenate([C, Sn[:, 1:fl]], axis=1)
    A, Bm = _idft_matrices(cfg)
    ABW = np.concatenate([A, Bm[1:fl]], axis=0)
    if fold_gain:
        ABW = ABW * cfg.synthesis_gain
    return CSW, ABW


class _Chan:
    """Per-channel ref view so ``_mcra_frame`` (which reads/writes
    ``ref[...]``) can run on one plane of an [M, sub, fl] scratch."""

    def __init__(self, ref, m):
        self.ref, self.m = ref, m

    def __getitem__(self, idx):
        return self.ref[self.m]

    def __setitem__(self, idx, v):
        self.ref[self.m] = v


def _tdgsc_pf_kernel(
    sig_ref, halo_ref, d_ref, yp_ref, sf_ref, up_ref, un_ref,  # inputs
    cs_ref, ab_ref, csw_ref, abw_ref,  # constants
    e_ref, p_ref,  # outputs
    Zr, Zi, Wt, Pm, Pn, S, Smin, Stmp, Pp, Lam,  # TDGSC core scratch
    McS, McSmin, McStmp, McP, McLam,  # OMLSA per-channel MCRA [1+C, sub, fl]
    ZetaY, ZetaU, OLam, OGam, OGH1, NyS, OutPrev, OLAc,  # OMLSA + synthesis
    *, Tc: int, C: int, fl: int, hop: int, Lf: int, ft: int,
    mu: float, alpha: float, sub: int,
    L: int, alpha_s: float, alpha_p: float, alpha_d: float, delta_s: float,
    p_min: float, p_max: float,
    om_L: int, om_alpha_s: float, om_alpha_p: float, om_alpha_d: float,
    om_delta_s: float, om_p_min: float, om_p_max: float,
    o_alpha_s: float, o_alpha_d: float, o_alpha_xi: float, o_beta: float,
    o_bmin: float, o_eps: float, o_gh: float, o_gl: float, o_oh: float,
    o_ol: float, o_qmin: float, o_qmax: float, o_gmin: float,
    vad_guard: bool = False,
):
    """TDGSC with the OM-LSA-multi postfilter fused in (TDGSC.py:152-170 +
    omlsa_multi.py:73-160): the AIC output and the BM references stream
    through in-kernel windowed STFTs, (1+C) MCRA noise trackers, the TBRR
    q-hat / decision-directed gain logic, and the windowed ISTFT
    overlap-add — all per frame in VMEM.  The Nyquist bin's recursions ride
    dedicated lane slots of ``NyS`` (its MCRA noise is the pinned
    closed-form, mcra.py:73)."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (Wt, Pm, Pn, S, Smin, Stmp, Pp, Lam,
                    McS, McSmin, McStmp, McP, McLam, ZetaU, OLam, OutPrev, OLAc):
            ref[...] = jnp.zeros_like(ref)
        ZetaY[...] = jnp.ones_like(ZetaY)
        OGam[...] = jnp.ones_like(OGam)
        OGH1[...] = jnp.ones_like(OGH1)
        ny_lane = jax.lax.broadcasted_iota(jnp.int32, NyS.shape, 1)
        # lanes: 0 zetaY | 1..C zetaU | C+1 lam | C+2 gamma | C+3 G_H1
        NyS[...] = jnp.where((ny_lane == 0) | (ny_lane == C + 2) | (ny_lane == C + 3), 1.0, 0.0)

    _bulk_analysis(sig_ref, halo_ref, cs_ref, Zr, Zi, C, Tc, sub, hop, fl)

    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, fl), 1)
    interior = lane >= 1
    mask0 = lane == 0
    tlane = jax.lax.broadcasted_iota(jnp.int32, (C * sub, Lf), 1)
    edge = (tlane >= ft) & (tlane < Lf - ft)
    ny_lane = jax.lax.broadcasted_iota(jnp.int32, NyS.shape, 1)
    chunk_base = pl.program_id(1) * Tc
    log_gmin = float(np.log(o_gmin))
    at0 = om_alpha_d + (1.0 - om_alpha_d) * om_p_min  # pinned-Nyquist MCRA pole

    def smooth_zero(v, v_right_col):
        """omlsa's zero-padded 3-tap smoothing on the main lanes; the
        right neighbour of lane fl-1 is the Nyquist value."""
        left = jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1)
        right = jnp.concatenate([v[:, 1:], v_right_col], axis=1)
        return 0.25 * left + 0.5 * v + 0.25 * right

    def frame(t, _):
        tg = chunk_base + t
        is_first = tg == 0
        p_out, _, sr = _mcra_frame(
            tg, yp_ref[t, 0], sf_ref[t, 0], S, Smin, Stmp, Pp, Lam, interior,
            mask0, L=L, alpha_s=alpha_s, alpha_p=alpha_p, alpha_d=alpha_d,
            delta_s=delta_s, p_min=p_min, p_max=p_max,
        )
        gate_r = 1.0 - p_out
        if vad_guard:  # TdGscConfig.vad_guard (see _tdgsc_kernel)
            gate_r = gate_r * (sr <= delta_s)
        gate_i = jnp.where(mask0, 1.0 - p_min, gate_r)
        p_ref[t, 0] = p_out
        e = _flms_gated_frame(
            t, Zr, Zi, Wt, Pm, Pn, cs_ref, ab_ref, d_ref[t, 0], gate_r, gate_i,
            mask0, edge, C, sub, fl, hop, Lf, mu, alpha,
        )

        # ---- windowed analysis of the AIC output (TDGSC.py:157) ----------
        yw = _dot(OutPrev[...], csw_ref[:hop]) + _dot(e, csw_ref[hop:])
        OutPrev[...] = e
        yr, yi = yw[:, :fl], yw[:, fl:]
        y = yr * yr + jnp.where(mask0, 0.0, yi * yi)  # beam power, bins 0..fl-1
        y_n = yi[:, :1] * yi[:, :1]  # Nyquist beam power [sub, 1]

        # ---- OMLSA's (1+C)-channel MCRA noise trackers --------------------
        powers = [y] + [up_ref[t, 0, c] for c in range(C)]
        nyqs = [y_n] + [un_ref[t, 0][:, c : c + 1] for c in range(C)]
        mus, mu_nys = [], []
        for m, (pw, pn) in enumerate(zip(powers, nyqs)):
            left = jnp.concatenate([pw[:, :1], pw[:, :-1]], axis=1)
            right = jnp.concatenate([pw[:, 1:], pn], axis=1)
            sf = 0.25 * left + 0.5 * pw + 0.25 * right
            _, mu_m, _ = _mcra_frame(
                tg, pw, sf, _Chan(McS, m), _Chan(McSmin, m), _Chan(McStmp, m),
                _Chan(McP, m), _Chan(McLam, m), interior, mask0,
                L=om_L, alpha_s=om_alpha_s, alpha_p=om_alpha_p,
                alpha_d=om_alpha_d, delta_s=om_delta_s, p_min=om_p_min,
                p_max=om_p_max,
            )
            mus.append(mu_m)
            mu_nys.append(at0 * 1e-8 + (1.0 - at0) * pn)  # pinned (mcra.py:73)

        # ---- zeta smoothing (omlsa_multi.py:94-95; zero-padded edges) -----
        zY = o_alpha_s * ZetaY[...] + (1.0 - o_alpha_s) * smooth_zero(y, y_n)
        zY = jnp.where(is_first, y, zY)
        ZetaY[...] = zY
        zUs = []
        for c in range(C):
            u_c = up_ref[t, 0, c]
            zU = o_alpha_s * ZetaU[c] + (1.0 - o_alpha_s) * smooth_zero(u_c, nyqs[1 + c])
            zU = jnp.where(is_first, u_c, zU)
            ZetaU[c] = zU
            zUs.append(zU)

        # ---- TBRR omega / gamma_s / q-hat (Eq.6, 27, 29) -------------------
        ref_max = zUs[0] - mus[1]
        for c in range(1, C):
            ref_max = jnp.maximum(ref_max, zUs[c] - mus[1 + c])
        omega = jnp.maximum(zY - mus[0], 1e-6) / (
            jnp.maximum(ref_max, o_eps * mus[0]) + 1e-6
        )
        omega = jnp.clip(omega, 0.1, 100.0)
        gamma_s = jnp.minimum(y / (mus[0] * o_bmin + 1e-6), 100.0)
        q_cand = jnp.maximum(
            (o_gh - gamma_s) / (o_gh - o_gl), (o_oh - omega) / (o_oh - o_ol)
        )
        absent = (gamma_s < o_gl) | (omega < o_ol)
        q = jnp.clip(jnp.where(absent, 1.0, q_cand), o_qmin, o_qmax)

        # ---- decision-directed gain (Eq.28/30; mcspp_base.py:140-156) ------
        gam = y / jnp.maximum(OLam[...], 1e-10)
        xi = o_alpha_xi * OGH1[...] ** 2 * OGam[...] + (1.0 - o_alpha_xi) * jnp.maximum(gam - 1.0, 0.0)
        nu = gam * xi / (1.0 + xi)
        GH1 = xi / (1.0 + xi)
        pp = 1.0 / (1.0 + q / (1.0 - q) * (1.0 + xi) * jnp.exp(-nu))
        a_t = o_alpha_d + (1.0 - o_alpha_d) * pp
        lam_new = jnp.where(is_first, y, a_t * OLam[...] + o_beta * (1.0 - a_t) * y)
        logG = pp * jnp.log(jnp.maximum(GH1, 1e-30)) + (1.0 - pp) * log_gmin
        G = jnp.clip(jnp.exp(logG), o_gmin, 1.0)
        G = jnp.where(is_first, 1.0, G)
        OLam[...] = lam_new
        OGam[...] = jnp.where(is_first, OGam[...], gam)
        OGH1[...] = jnp.where(is_first, OGH1[...], GH1)

        # ---- the same chain for the Nyquist bin on NyS lane slots ---------
        ny = NyS[...]
        col = lambda k: ny[:, k : k + 1]
        zY_n = jnp.where(is_first, y_n, o_alpha_s * col(0) + (1.0 - o_alpha_s) * (0.25 * y[:, -1:] + 0.5 * y_n))
        zU_n, refmax_n = [], None
        for c in range(C):
            u_c_n = nyqs[1 + c]
            v = jnp.where(is_first, u_c_n,
                          o_alpha_s * col(1 + c) + (1.0 - o_alpha_s) * (0.25 * up_ref[t, 0, c][:, -1:] + 0.5 * u_c_n))
            zU_n.append(v)
            d = v - mu_nys[1 + c]
            refmax_n = d if refmax_n is None else jnp.maximum(refmax_n, d)
        omega_n = jnp.clip(
            jnp.maximum(zY_n - mu_nys[0], 1e-6) / (jnp.maximum(refmax_n, o_eps * mu_nys[0]) + 1e-6),
            0.1, 100.0,
        )
        gs_n = jnp.minimum(y_n / (mu_nys[0] * o_bmin + 1e-6), 100.0)
        q_n = jnp.clip(
            jnp.where((gs_n < o_gl) | (omega_n < o_ol), 1.0,
                      jnp.maximum((o_gh - gs_n) / (o_gh - o_gl), (o_oh - omega_n) / (o_oh - o_ol))),
            o_qmin, o_qmax,
        )
        gam_n = y_n / jnp.maximum(col(C + 1), 1e-10)
        xi_n = o_alpha_xi * col(C + 3) ** 2 * col(C + 2) + (1.0 - o_alpha_xi) * jnp.maximum(gam_n - 1.0, 0.0)
        nu_n = gam_n * xi_n / (1.0 + xi_n)
        GH1_n = xi_n / (1.0 + xi_n)
        pp_n = 1.0 / (1.0 + q_n / (1.0 - q_n) * (1.0 + xi_n) * jnp.exp(-nu_n))
        at_n = o_alpha_d + (1.0 - o_alpha_d) * pp_n
        lam_nn = jnp.where(is_first, y_n, at_n * col(C + 1) + o_beta * (1.0 - at_n) * y_n)
        G_n = jnp.clip(jnp.exp(pp_n * jnp.log(jnp.maximum(GH1_n, 1e-30)) + (1.0 - pp_n) * log_gmin), o_gmin, 1.0)
        G_n = jnp.where(is_first, 1.0, G_n)
        gam_n = jnp.where(is_first, col(C + 2), gam_n)
        GH1_n = jnp.where(is_first, col(C + 3), GH1_n)
        # repack the NyS lane slots
        slots = jnp.concatenate(
            [zY_n] + zU_n + [lam_nn, gam_n, GH1_n], axis=1
        )  # [sub, C + 4]
        NyS[...] = jnp.where(ny_lane < C + 4, jnp.pad(slots, [(0, 0), (0, NyS.shape[1] - (C + 4))]), ny)

        # ---- sqrt-gain + windowed ISTFT overlap-add (TDGSC.py:163-169) ----
        sg = jnp.sqrt(G)
        sg_i = jnp.where(mask0, jnp.sqrt(G_n), sg)
        f = _dot(jnp.concatenate([sg * yr, sg_i * yi], axis=-1), abw_ref[...])
        e_ref[t, 0] = f[:, :hop] + OLAc[...]
        OLAc[...] = f[:, hop:]
        return 0

    jax.lax.fori_loop(0, Tc, frame, 0)


def _kws_kernel(
    sig_ref, halo_ref, d_ref, cs_ref, ab_ref,  # inputs
    o_ref,  # output: cleaned blocks [tc, 1, sub, hop]
    Zr, Zi, Wt, Pm, Pn, Fifo,  # scratch
    *, Tc: int, fl: int, hop: int, Lf: int, Dn: int,
    mu: float, alpha: float, sub: int,
):
    """Dual-mic KWS cleaner (dual_mic_kws.py:111-152): a continuously
    adapting single-channel FLMS ANC whose taps are applied ``Dn`` frames
    LATE by a frozen cleaner.  The tap FIFO is a circular [Dn, sub, Lf]
    scratch indexed by frame number — no per-frame shifting of the 94-slot
    queue.  6 small in-VMEM dots per frame."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (Wt, Pm, Pn, Fifo):
            ref[...] = jnp.zeros_like(ref)

    _bulk_analysis(sig_ref, halo_ref, cs_ref, Zr, Zi, 1, Tc, sub, hop, fl)

    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, fl), 1)
    mask0 = lane == 0
    chunk_base = pl.program_id(1) * Tc

    def frame(t, _):
        tg = chunk_base + t
        xr, xi = Zr[0, t], Zi[0, t]
        d_t = d_ref[t, 0]  # x1 delayed by Lf/2 (non_causal)

        # ---- ANC: adapt on the current frame -------------------------------
        Wz = _dot(Wt[...], cs_ref[:Lf])  # [sub, 2fl]
        yr, yi = _cmul_acc(xr, xi, Wz[:, :fl], Wz[:, fl:], mask0)
        pw = xr * xr + jnp.where(mask0, 0.0, xi * xi)
        Pmc = jnp.maximum(alpha * Pm[...] + (1.0 - alpha) * pw, 1e-4)
        Pnc = jnp.maximum(alpha * Pn[...] + (1.0 - alpha) * (xi * xi), 1e-4)
        Pm[...] = Pmc
        Pn[...] = Pnc
        y = _dot(jnp.concatenate([yr, yi], axis=-1), ab_ref[:, hop:])
        e = d_t - y
        Ez = _dot(e, cs_ref[hop:])
        gr, gi = _cmul_conj(xr, xi, Ez[:, :fl], Ez[:, fl:], mask0)
        G = jnp.concatenate([gr / Pmc, gi / jnp.where(mask0, Pnc, Pmc)], axis=-1)
        g_t = _dot(G, ab_ref[:, :Lf])  # constrained support = first Lf taps
        w_new = Wt[...] + 2.0 * mu * g_t
        Wt[...] = w_new

        # ---- deferred-tap cleaner (the FIFO tail, frozen) ------------------
        slot = tg % Dn
        w_old = Fifo[slot]  # taps pushed Dn frames ago (zeros at start)
        Fifo[slot] = w_new
        Wf = _dot(w_old, cs_ref[:Lf])
        cr, ci = _cmul_acc(xr, xi, Wf[:, :fl], Wf[:, fl:], mask0)
        y_c = _dot(jnp.concatenate([cr, ci], axis=-1), ab_ref[:, hop:])
        o_ref[t, 0] = d_t - y_c
        return 0

    jax.lax.fori_loop(0, Tc, frame, 0)


def fused_kws(
    x: jnp.ndarray,
    cfg=None,
    interpret: bool = None,
    t_chunk: int = None,
    sub: int = _SUB,
):
    """Fused dual-mic KWS cleaner: x [B, 2, S] -> cleaned [B, S'], matching
    ``kws.dual_mic.kws_process``.  B % sub == 0."""
    from distantspeech_tpu.kws.dual_mic import DualMicKwsConfig

    if cfg is None:
        cfg = DualMicKwsConfig()
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if x.ndim != 3 or x.shape[1] != 2 or x.shape[0] % sub:
        raise ValueError(f"fused_kws needs x [B, 2, S] with B % {sub} == 0, got {x.shape}")
    fcfg = cfg.flms
    Lf, hop, n_fft = fcfg.filter_len, fcfg.hop, fcfg.n_fft
    fl = n_fft // 2
    if fl % 128 or hop != Lf:
        raise ValueError(f"fused_kws needs the default hop == filter_len layout, got L={Lf}")
    B, _, Sx = x.shape
    T = Sx // Lf
    x = x[..., : T * Lf]
    nb = B // sub
    Dn = cfg.delay_frames_n

    # non-causal desired: mic1 delayed by filter_len/2
    d = jnp.pad(x[:, 1], [(0, 0), (Lf // 2, 0)])[..., : T * Lf]
    d_in = jnp.moveaxis(d.reshape(B, T, Lf), 1, 0)
    tc = t_chunk or _pick_t_chunk(T, 32) or 32
    Tp = -(-T // tc) * tc
    if Tp != T:
        d_in = jnp.pad(d_in, [(0, Tp - T), (0, 0), (0, 0)])
    d_in = d_in.reshape(Tp, nb, sub, Lf)

    x0b = jnp.pad(x[:, 0], [(0, 0), (hop, 0)]).reshape(B, 1, T + 1, hop)
    if Tp != T:
        x0b = jnp.pad(x0b, [(0, 0), (0, 0), (0, Tp - T), (0, 0)])
    sig = jnp.transpose(x0b, (2, 1, 0, 3))

    CS, AB = (m.astype(np.float32) for m in plain_dft_packed(n_fft))
    kern = partial(_kws_kernel, Tc=tc, fl=fl, hop=hop, Lf=Lf, Dn=Dn,
                   mu=fcfg.mu, alpha=fcfg.alpha, sub=sub)
    sig_spec = pl.BlockSpec((tc, 1, sub, hop), lambda n, t: (t, 0, n, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, 1, sub, hop), lambda n, t: (t * tc + tc, 0, n, 0), memory_space=pltpu.VMEM)
    tile = lambda last: pl.BlockSpec((tc, 1, sub, last), lambda n, t: (t, n, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda n, t: (0, 0), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((1, tc, sub, fl), jnp.float32),
        pltpu.VMEM((1, tc, sub, fl), jnp.float32),
        pltpu.VMEM((sub, Lf), jnp.float32),  # Wt (single channel)
        pltpu.VMEM((sub, fl), jnp.float32),
        pltpu.VMEM((sub, fl), jnp.float32),
        pltpu.VMEM((Dn, sub, Lf), jnp.float32),  # Fifo
    ]
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    o_out = pl.pallas_call(
        kern,
        grid=(nb, Tp // tc),
        in_specs=[sig_spec, halo_spec, tile(Lf), const(CS.shape), const(AB.shape)],
        out_specs=tile(hop),
        out_shape=jax.ShapeDtypeStruct((Tp, nb, sub, hop), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        **({} if params is None else {"compiler_params": params}),
    )(sig, sig, d_in, jnp.asarray(CS), jnp.asarray(AB))
    return jnp.moveaxis(o_out[:T].reshape(T, B, Lf), 0, 1).reshape(B, T * Lf)
