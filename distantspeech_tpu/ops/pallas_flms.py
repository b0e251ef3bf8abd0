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


def _tdgsc_kernel(
    sig_ref, halo_ref, d_ref, yp_ref, sf_ref, cs_ref, ab_ref,  # inputs
    e_ref, p_ref,  # outputs
    Zr, Zi, Wt, Pm, Pn, S, Smin, Stmp, Pp, Lam,  # scratch
    *, Tc: int, C: int, fl: int, hop: int, Lf: int, ft: int,
    mu: float, alpha: float, sub: int,
    L: int, alpha_s: float, alpha_p: float, alpha_d: float, delta_s: float,
    p_min: float, p_max: float, unroll: int = 1, _stages: int = 7,
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
        p_out, _, _ = _mcra_frame(
            tg, yp_ref[t, 0], sf_ref[t, 0], S, Smin, Stmp, Pp, Lam, interior,
            mask0, L=L, alpha_s=alpha_s, alpha_p=alpha_p, alpha_d=alpha_d,
            delta_s=delta_s, p_min=p_min, p_max=p_max,
        )
        gate_r = 1.0 - p_out  # per-bin stepsize (TDGSC.py:150)
        gate_i = jnp.where(mask0, 1.0 - p_min, gate_r)  # Nyquist p pinned
        if not _stages & 1:  # profiling: MCRA only
            e_ref[t, 0] = d_ref[t, 0] + p_out[:, :hop]
            p_ref[t, 0] = p_out
            return 0

        # filter spectrum from time-domain taps (support = first Lf samples)
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
        e = d_ref[t, 0] - y
        e_ref[t, 0] = e
        p_ref[t, 0] = p_out

        if not _stages & 2:  # profiling: forward only, no adaptation
            return 0
        Ez = _dot(e, cs_ref[hop:])  # rdft of front-zero-padded error
        Er, Ei = Ez[:, :fl], Ez[:, fl:]
        Pdi = jnp.where(mask0, Pnc, Pmc)

        G = []
        for c in range(C):
            xr, xi = Zr[c, t], Zi[c, t]
            gr, gi = _cmul_conj(xr, xi, Er, Ei, mask0)
            G.append(jnp.concatenate([gr / Pmc, gi / Pdi], axis=-1))
        Gflat = jnp.concatenate(G, axis=0)  # [C*sub, 2fl]

        if not _stages & 4:  # profiling: ungated unconstrained update
            u0 = _dot(Gflat, ab_ref[:, :Lf])
            Wt[...] = jnp.where(edge, Wt[...].reshape(C * sub, Lf) + 2.0 * mu * u0, 0.0).reshape(C, sub, Lf)
            return 0
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
    """Fused TDGSC (postfilter=False core): same signature/returns as
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
    if cfg.postfilter:
        raise ValueError("fused_tdgsc implements the postfilter=False core; "
                         "apply OMLSA via the bulk STFT round-trip outside")
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
