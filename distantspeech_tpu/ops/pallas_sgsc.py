"""Fused SubbandGSC: McSpp + subband-LMS BM/AIC + transforms in ONE kernel.

Oracle: SubbandGSC.process (/root/reference/DistantSpeech/beamformer/
SubbandGSC.py:170-263) with McSpp.estimation (noise_estimation/mcspp.py:
244-265), McCDR (mccdr.py:126-182), SubbandLMS / SubbandLmsMc
(adaptivefilter/SubbandLMS.py:28-88, SubbandLmsMc.py:144-191).

Why this exists: the scan path is McSpp-bound — its per-frame [B, F, 4, 4]
complex covariance recursions and Gauss-Jordan inverses read+write ~8 MB of
HBM state per frame (benchmarks/profile_subband_gsc.py: the McSpp scan is
10.2 of the 31 ms iteration at B=32; the three 4x4 inverses dominate it).
This kernel keeps BOTH covariance matrices, the CDR/MCRA tracks, and all
four adaptive-filter states resident in VMEM across the whole utterance, so
per-frame HBM traffic drops to the input spectra alone; the 4x4 complex
eliminations run as unrolled VPU plane arithmetic over (sub x bins) tiles.

Spectral layout (differs from pallas_flms's packed halves ON PURPOSE): all
F = 257 bins live on lanes 0..256 of 384-lane planes, real and imaginary in
SEPARATE planes.  The imaginary parts of bins 0 and 256 are *exactly* zero
and stay exactly zero through the complex arithmetic (products of exact
zeros), so no Nyquist lane-packing tricks are needed — the price is 1.5x
lane padding on VPU ops and a wider (and still tiny) DFT matmul, which the
McSpp math amortises completely.  The structurally-zero sin columns/rows of
the full-bin DFT matrices are zeroed exactly so this invariant holds.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distantspeech_tpu.ops.pallas_enhance import _mcra_frame, _pick_t_chunk
from distantspeech_tpu.ops.pallas_flms import _Chan

_SUB = 8


@lru_cache(maxsize=None)
def fullbin_dft_matrices(n_fft: int, hop: int, fpad: int):
    """Windowed analysis/synthesis matrices in the full-bin 2*fpad layout.

    Returns (CSF [n_fft, 2*fpad], ABF [2*fpad, n_fft]): columns/rows
    0..F-1 are the real part, fpad..fpad+F-1 the imaginary part; the
    imaginary columns of bins 0 and F-1 are exactly zero (their true DFT
    value).  The hop/W0 synthesis gain is folded into ABF (linear, so
    scaling frames before overlap-add equals scaling after)."""
    from distantspeech_tpu.transform.stft import StftConfig, _dft_matrices, _idft_matrices

    cfg = StftConfig(n_fft, hop)
    F = cfg.half_bin
    C, S = _dft_matrices(cfg)
    S = S.copy()
    S[:, 0] = 0.0
    if n_fft % 2 == 0:
        S[:, F - 1] = 0.0
    CSF = np.zeros((n_fft, 2 * fpad))
    CSF[:, :F] = C
    CSF[:, fpad : fpad + F] = S
    A, Bm = _idft_matrices(cfg)
    ABF = np.zeros((2 * fpad, n_fft))
    ABF[:F] = A
    ABF[fpad : fpad + F] = Bm
    ABF[fpad] = 0.0
    if n_fft % 2 == 0:
        ABF[fpad + F - 1] = 0.0
    return CSF * 1.0, ABF * cfg.synthesis_gain


def _dot(a, b):
    return jnp.dot(a, b, precision="highest", preferred_element_type=jnp.float32)


# ---- complex plane-pair helpers (value tuples (re, im)) --------------------


def _cmul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _cmul_conj(a, b):
    """a * conj(b)"""
    return a[0] * b[0] + a[1] * b[1], a[1] * b[0] - a[0] * b[1]


def _cadd(a, b):
    return a[0] + b[0], a[1] + b[1]


def _csub(a, b):
    return a[0] - b[0], a[1] - b[1]


def _cscale(a, s):
    return a[0] * s, a[1] * s


def _cdiv(a, b):
    den = b[0] * b[0] + b[1] * b[1]
    return (a[0] * b[0] + a[1] * b[1]) / den, (a[1] * b[0] - a[0] * b[1]) / den


def _inv4(A, one, zero):
    """Gauss-Jordan inverse of a 4x4 complex plane-pair matrix, matching
    stats.linalg.gauss_jordan_inv's pivoting-free elimination order (its
    callers always diagonally load)."""
    n = 4
    work = [[A[r][c] for c in range(n)] + [ (one, zero) if r == c else (zero, zero) for c in range(n)] for r in range(n)]
    for k in range(n):
        piv = work[k][k]
        prow = [_cdiv(work[k][j], piv) for j in range(2 * n)]
        col = [work[r][k] for r in range(n)]
        work = [
            [_csub(work[r][j], _cmul(col[r], prow[j])) for j in range(2 * n)]
            for r in range(n)
        ]
        work[k] = prow
    return [[work[r][n + c] for c in range(n)] for r in range(n)]


_OFF = {(0, 1): 0, (0, 2): 1, (0, 3): 2, (1, 2): 3, (1, 3): 4, (2, 3): 5}


def _phi_full(diag, off, zero):
    """Materialise the full 4x4 matrix from hermitian storage: ``diag`` =
    4 real planes, ``off`` = 6 (re, im) pairs in _OFF order."""
    M = [[None] * 4 for _ in range(4)]
    for i in range(4):
        M[i][i] = (diag[i], zero)
        for j in range(i + 1, 4):
            r, im = off[_OFF[(i, j)]]
            M[i][j] = (r, im)
            M[j][i] = (r, -im)
    return M


def _bulk_analysis_fullbin(sig_ref, halo_ref, csf_ref, Zr, Zi, nch, Tc, sub, hop, fpad):
    """Z_t = [b_{t-1} | b_t] @ CSF for every frame of the chunk, two MXU
    dots per channel (the analysis inputs are input-only — the
    pallas_flms._bulk_analysis pattern in the full-bin layout)."""
    for c in range(nch):
        a1 = sig_ref[:, c]  # [Tc, sub, hop] = blocks t-1 (pre-padded)
        a2 = jnp.concatenate([a1[1:], halo_ref[:, c]], axis=0)
        z = _dot(a1.reshape(Tc * sub, hop), csf_ref[:hop])
        z = z + _dot(a2.reshape(Tc * sub, hop), csf_ref[hop:])
        z = z.reshape(Tc, sub, 2 * fpad)
        Zr[c] = z[:, :, :fpad]
        Zi[c] = z[:, :, fpad:]


def _sgsc_kernel(
    sig_ref, halo_ref, sf_ref,  # inputs
    fn_ref, csf_ref, abf_ref,  # constants
    out_ref, p_ref, bm_ref,  # outputs
    Zr, Zi,  # analysis scratch [C+1, Tc, sub, fpad]
    PhiY, PhiV, Msc, Mc, Wbm, Pbm, XfP, OlaBm, UPrev, Waic, UBuf, Paic, OlaOut,  # scratch
    *, Tc: int, C: int, F: int, fpad: int, hop: int, n_fft: int,
    sp_alpha: float, sp_alpha_d: float, diag_min: float, diag_max: float,
    warmup: int, repair: int, q_lo: int, q_hi: int,
    msc_alpha: float,
    L: int, alpha_s: float, alpha_p: float, alpha_d: float, delta_s: float,
    p_min: float, p_max: float,
    bm_mu: float, bm_alpha: float, aic_mu: float, aic_alpha: float, af_eps: float,
    freeze_thresh: float, aic_warmup: int,
):
    """The whole SubbandGSC frame loop (see module docstring)."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for ref in (PhiY, PhiV, Msc, Mc, Wbm, Pbm, XfP, OlaBm, UPrev, Waic, UBuf, Paic, OlaOut):
            ref[...] = jnp.zeros_like(ref)

    # in-kernel analysis of the C mics + the FBF (channel C): the scan's
    # stft_stream of aligned/fbf, as bulk dots on the raw time blocks
    _bulk_analysis_fullbin(sig_ref, halo_ref, csf_ref[...], Zr, Zi, C + 1,
                           Tc, sig_ref.shape[-2], hop, fpad)

    lane = jax.lax.broadcasted_iota(jnp.int32, (sig_ref.shape[-2], fpad), 1)
    valid = lane < F
    interior = (lane >= 1) & (lane <= F - 2)
    mask0 = lane == 0
    band = ((lane >= q_lo) & (lane < q_hi)).astype(jnp.float32)
    band_n = float(q_hi - q_lo)
    Fn = fn_ref[...]
    zero = jnp.zeros_like(Fn)
    one = jnp.ones_like(Fn)
    chunk_base = pl.program_id(1) * Tc

    def frame(t, _):
        tg = chunk_base + t
        d = [(Zr[c, t], Zi[c, t]) for c in range(C)]
        Xf = (Zr[C, t], Zi[C, t])
        XfPrev = (XfP[0], XfP[1])  # = Xf_{t-1} = this frame's delayed-FBF Yf

        # ---- McCDR (mccdr.py:126-182): pair-(1,2) coherence x MCRA -------
        p11 = msc_alpha * Msc[0] + (1.0 - msc_alpha) * (d[1][0] ** 2 + d[1][1] ** 2)
        p22 = msc_alpha * Msc[1] + (1.0 - msc_alpha) * (d[2][0] ** 2 + d[2][1] ** 2)
        c12 = _cmul_conj(d[1], d[2])
        p12 = (msc_alpha * Msc[2] + (1.0 - msc_alpha) * c12[0],
               msc_alpha * Msc[3] + (1.0 - msc_alpha) * c12[1])
        Msc[0], Msc[1], Msc[2], Msc[3] = p11, p22, p12[0], p12[1]
        den = jnp.sqrt(p11 * p22)
        Fx = (p12[0] / den, p12[1] / den)
        Fx2 = Fx[0] * Fx[0] + Fx[1] * Fx[1]
        Fxr = Fx[0]
        Fn2 = Fn * Fn
        # radicand clamped at 0: it cancels to a tiny float32 negative when
        # |Fx| ~ 1 and sqrt(-eps) = NaN (see noise/mccdr.py)
        rad = Fn2 * Fxr * Fxr - Fn2 * Fx2 + Fn2 - 2.0 * Fn * Fxr + Fx2
        num = Fn * Fxr - Fx2 - jnp.sqrt(jnp.maximum(rad, 0.0))
        Gamma = num / jnp.minimum(Fx2 - 1.0, -1e-3)
        Gamma = Gamma * Gamma
        Gamma = jnp.where(Gamma > 1.0, 1.0, Gamma)
        Gamma = jnp.where(Gamma < 0.0, 1e-3, Gamma)

        Yp = d[0][0] ** 2 + d[0][1] ** 2
        p_mcra, _, _ = _mcra_frame(
            tg, Yp, sf_ref[t, 0], _Chan(Mc, 0), _Chan(Mc, 1), _Chan(Mc, 2),
            _Chan(Mc, 3), _Chan(Mc, 4), interior, mask0,
            L=L, alpha_s=alpha_s, alpha_p=alpha_p, alpha_d=alpha_d,
            delta_s=delta_s, p_min=p_min, p_max=p_max,
        )
        cdr_p = jnp.sqrt(Gamma * p_mcra)
        q = 1.0 - cdr_p  # mcspp.py:116-117
        # padding lanes carry 0/0 = NaN coherence; they must not leak into
        # the band reduction below (NaN * 0 == NaN), and keeping q inert
        # there keeps every later plane op lane-local
        q = jnp.where(valid, q, 0.0)

        # ---- adaptive loading from the pre-warm q band (mcspp.py:262-264)
        q_avg = jnp.sum(q * band, axis=1, keepdims=True) / band_n
        dval = q_avg * diag_max + (1.0 - q_avg) * diag_min  # [sub, 1]

        # ---- Phi_yy recursion (hermitian storage: 4 diag + 6 off) --------
        warm = tg < warmup
        psd_d = [d[i][0] ** 2 + d[i][1] ** 2 for i in range(4)]
        psd_o = [_cmul_conj(d[i], d[j]) for (i, j) in _OFF]
        yd = [sp_alpha * PhiY[i] + (1.0 - sp_alpha) * psd_d[i] for i in range(4)]
        yo = []
        for t_idx, (i, j) in enumerate(_OFF):
            r = sp_alpha * PhiY[4 + 2 * t_idx] + (1.0 - sp_alpha) * psd_o[t_idx][0]
            im = sp_alpha * PhiY[4 + 2 * t_idx + 1] + (1.0 - sp_alpha) * psd_o[t_idx][1]
            yo.append((r, im))
        for i in range(4):
            PhiY[i] = yd[i]
        for t_idx in range(6):
            PhiY[4 + 2 * t_idx] = yo[t_idx][0]
            PhiY[4 + 2 * t_idx + 1] = yo[t_idx][1]

        # Phi_vv selection: warm frames track Phi_yy (mcspp.py:276-278)
        vd = [jnp.where(warm, yd[i], PhiV[i]) for i in range(4)]
        vo = [(jnp.where(warm, yo[t][0], PhiV[4 + 2 * t]),
               jnp.where(warm, yo[t][1], PhiV[4 + 2 * t + 1])) for t in range(6)]
        q = jnp.where(warm, jnp.full_like(q, 0.99), q)

        # ---- estimation core (mcspp.py:201-245) --------------------------
        Yf_mat = _phi_full(yd, yo, zero)
        A = _phi_full([vd[i] + dval for i in range(4)], vo, zero)
        Pinv = _inv4(A, one, zero)
        xi = -float(C)
        for i in range(4):
            acc = (zero, zero)
            for j in range(4):
                acc = _cadd(acc, _cmul(Pinv[i][j], Yf_mat[j][i]))
            xi = xi + acc[0]
        neg = xi < 0.0
        rep_gate = jnp.where(tg < repair, 1.0, 0.0)
        A2 = _phi_full([yd[i] + rep_gate * dval for i in range(4)], yo, zero)
        Pinv2 = _inv4(A2, one, zero)
        Pinv = [[(jnp.where(neg, Pinv2[i][j][0], Pinv[i][j][0]),
                  jnp.where(neg, Pinv2[i][j][1], Pinv[i][j][1])) for j in range(4)]
                for i in range(4)]
        xi = -float(C)
        for i in range(4):
            acc = (zero, zero)
            for j in range(4):
                acc = _cadd(acc, _cmul(Pinv[i][j], Yf_mat[j][i]))
            xi = xi + acc[0]
        xi = jnp.clip(xi, 1e-6, 1e8)

        # gamma = y^H Pinv Phi_yy Pinv y - y^H Pinv y (literal, mcspp.py:230)
        lv = []
        rv = []
        for j in range(4):
            accl = (zero, zero)
            accr = (zero, zero)
            for k in range(4):
                accl = _cadd(accl, _cmul((d[k][0], -d[k][1]), Pinv[k][j]))
                accr = _cadd(accr, _cmul(Pinv[j][k], d[k]))
            lv.append(accl)
            rv.append(accr)
        t1 = (zero, zero)
        t2 = (zero, zero)
        for i in range(4):
            acc = (zero, zero)
            for j in range(4):
                acc = _cadd(acc, _cmul(Yf_mat[i][j], rv[j]))
            t1 = _cadd(t1, _cmul(lv[i], acc))
            t2 = _cadd(t2, _cmul(lv[i], d[i]))
        gamma = jnp.clip(t1[0] - t2[0], 1e-6, 1e8)

        # q == 1.0 float32 underflow guard: the q -> 1 limit is p = 0 (see
        # noise/mcspp.py) — without it inf * exp(-huge) = NaN
        ratio = q / (1.0 - q) * (1.0 + xi) * jnp.exp(-(gamma / (1.0 + xi)))
        p = jnp.where(q >= 1.0, 0.0, 1.0 / (1.0 + ratio))
        p = jnp.clip(p, 0.0, 1.0)
        p = jnp.where(valid, p, 0.0)  # keep padding lanes inert
        p_ref[t, 0] = p

        # ---- noise update (mcspp.py:281) ---------------------------------
        at = sp_alpha_d + (1.0 - sp_alpha_d) * p
        for i in range(4):
            PhiV[i] = at * vd[i] + (1.0 - at) * psd_d[i]
        for t_idx in range(6):
            PhiV[4 + 2 * t_idx] = at * vo[t_idx][0] + (1.0 - at) * psd_o[t_idx][0]
            PhiV[4 + 2 * t_idx + 1] = at * vo[t_idx][1] + (1.0 - at) * psd_o[t_idx][1]

        # ---- blocking matrix: per-mic 2-tap subband NLMS (p-gated) -------
        pbuf = Xf[0] * Xf[0] + Xf[1] * Xf[1] + XfPrev[0] * XfPrev[0] + XfPrev[1] * XfPrev[1]
        e_bm = []
        for c in range(C):
            W0 = (Wbm[4 * c], Wbm[4 * c + 1])
            W1 = (Wbm[4 * c + 2], Wbm[4 * c + 3])
            # y = conj(W0)*Xf + conj(W1)*Xf_{t-1}  (SubbandLMS.py:60)
            y = _cadd(_cmul_conj(Xf, W0), _cmul_conj(XfPrev, W1))
            e = _csub(d[c], _cscale(y, p))
            Pc = bm_alpha * Pbm[c] + (1.0 - bm_alpha) * pbuf
            Pbm[c] = Pc
            ec = (jnp.where(valid, e[0], 0.0), jnp.where(valid, e[1], 0.0))
            e_bm.append(ec)
            g0 = _cmul_conj(Xf, ec)  # buf * conj(err)
            g1 = _cmul_conj(XfPrev, ec)
            scale = 2.0 * bm_mu * p / (Pc + af_eps)
            Wbm[4 * c] = W0[0] + g0[0] * scale
            Wbm[4 * c + 1] = W0[1] + g0[1] * scale
            Wbm[4 * c + 2] = W1[0] + g1[0] * scale
            Wbm[4 * c + 3] = W1[1] + g1[1] * scale

        # ---- BM synthesis + AIC input analysis (transform round-trip) ----
        U = []
        for c in range(C):
            fr = _dot(jnp.concatenate([e_bm[c][0], e_bm[c][1]], axis=-1), abf_ref[...])  # [sub, n_fft]
            blk = OlaBm[c] + fr[:, :hop]
            OlaBm[c] = fr[:, hop:]
            bm_ref[t, 0, c] = blk
            uz = _dot(jnp.concatenate([UPrev[c], blk], axis=-1), csf_ref[...])  # [sub, 2*fpad]
            UPrev[c] = blk
            U.append((uz[:, :fpad], uz[:, fpad:]))

        # ---- AIC: multichannel 2-tap subband NLMS, (1-p)-gated -----------
        gate = 1.0 - p
        if freeze_thresh > 0.0:
            gate = gate * (p <= freeze_thresh)
        if aic_warmup > 0:
            gate = gate * (tg >= aic_warmup)
        y = (zero, zero)
        pw = zero
        for c in range(C):
            Up = (UBuf[2 * c], UBuf[2 * c + 1])
            W0 = (Waic[4 * c], Waic[4 * c + 1])
            W1 = (Waic[4 * c + 2], Waic[4 * c + 3])
            y = _cadd(y, _cmul_conj(U[c], W0))  # conj(W) * buf
            y = _cadd(y, _cmul_conj(Up, W1))
            pw = pw + U[c][0] ** 2 + U[c][1] ** 2 + Up[0] ** 2 + Up[1] ** 2
        e = _csub(XfPrev, _cscale(y, gate))  # desired = delayed FBF = Xf_{t-1}
        e = (jnp.where(valid, e[0], 0.0), jnp.where(valid, e[1], 0.0))
        Pa = aic_alpha * Paic[0] + (1.0 - aic_alpha) * pw / float(C)
        Paic[0] = Pa
        scale = 2.0 * aic_mu * gate / (Pa + af_eps)
        for c in range(C):
            Up = (UBuf[2 * c], UBuf[2 * c + 1])
            g0 = _cmul_conj(U[c], e)  # buf * conj(err)
            g1 = _cmul_conj(Up, e)
            Waic[4 * c] = Waic[4 * c] + g0[0] * scale
            Waic[4 * c + 1] = Waic[4 * c + 1] + g0[1] * scale
            Waic[4 * c + 2] = Waic[4 * c + 2] + g1[0] * scale
            Waic[4 * c + 3] = Waic[4 * c + 3] + g1[1] * scale
            UBuf[2 * c] = U[c][0]
            UBuf[2 * c + 1] = U[c][1]

        fr = _dot(jnp.concatenate([e[0], e[1]], axis=-1), abf_ref[...])
        out_ref[t, 0] = OlaOut[0] + fr[:, :hop]
        OlaOut[0] = fr[:, hop:]

        XfP[0] = Xf[0]
        XfP[1] = Xf[1]
        return 0

    jax.lax.fori_loop(0, Tc, frame, 0)


def fused_subband_gsc(
    x: jnp.ndarray,
    geometry,
    angle_rad=(197.0 / 180.0 * np.pi, 0.0),
    cfg=None,
    interpret: bool = None,
    t_chunk: int = None,
    sub: int = None,
):
    """Fused SubbandGSC: same signature/returns as
    ``beamform.subband_gsc.subband_gsc_process`` — (out [B, S'], p [B, T, F],
    bm [B, M, S']).  x: [B, M, S] with B % sub == 0, M == 4 (the McSpp 4x4
    elimination is unrolled; the reference itself is 4-channel-only,
    mcspp.py:54).

    ``sub`` defaults to 16 batch rows per vreg tile when B allows (measured
    14.0k vs 10.1k audio-s/s at sub=8, B=32 — wider tiles amortise the
    VPU instruction issue of the unrolled 4x4 eliminations); the VMEM-fit
    frame chunk shrinks correspondingly (sub=32 exceeds the 16 MB scoped
    limit)."""
    from distantspeech_tpu.adaptive.feature import dc_notch, dc_notch_init
    from distantspeech_tpu.array.alignment import time_alignment_filters
    from distantspeech_tpu.beamform.subband_gsc import SubbandGscConfig
    from distantspeech_tpu.noise.mcra import _freq_smooth
    from distantspeech_tpu.ops.fir import fir_filter_offline
    from distantspeech_tpu.transform.stft import stft_frames

    if cfg is None:
        cfg = SubbandGscConfig()
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if sub is None:
        sub = 16 if (x.ndim == 3 and x.shape[0] % 16 == 0) else _SUB
    if x.ndim != 3 or x.shape[0] % sub:
        raise ValueError(f"fused_subband_gsc needs x [B, M, S] with B % {sub} == 0, got {x.shape}")
    if cfg.n_mics != 4:
        raise ValueError("fused_subband_gsc implements the reference's 4-mic McSpp (mcspp.py:54)")
    L = cfg.frame_len
    scfg = cfg.stft
    n_fft, hop, F = scfg.n_fft, scfg.hop, scfg.half_bin
    if hop != L or n_fft != 2 * L or L % 128:
        raise ValueError(f"fused_subband_gsc needs the default n_fft=2L, hop=L layout with L % 128 == 0, got L={L}")
    fpad = -(-F // 128) * 128
    B, M, Sx = x.shape
    C = M
    T = Sx // L
    x = x[..., : T * L]
    nb = B // sub

    # ---- whole-utterance preprocessing (input-only -> XLA bulk) ------------
    _, xn = dc_notch(dc_notch_init(x.shape[:-1], dtype=x.dtype), x, radius=0.98)
    coeffs = jnp.asarray(np.asarray(time_alignment_filters(geometry, angle_rad)), dtype=x.dtype)
    aligned = fir_filter_offline(xn, coeffs)[..., : T * L]
    fbf = jnp.mean(aligned, axis=-2)
    # only the MCRA's frequency-smoothed mic-0 power is precomputed (its
    # 3-tap bin smoothing is cross-lane); the mic/FBF spectra are analysed
    # IN-KERNEL from raw time blocks — shipping precomputed complex spectra
    # cost more than the kernel itself (~16 of 25 ms at B=32: the [B,M,T,F]
    # complex materialisation + transposes are pure HBM traffic)
    P0c = stft_frames(jnp.pad(aligned[:, 0], [(0, 0), (scfg.overlap, 0)]), scfg)
    P0 = jnp.real(P0c) ** 2 + jnp.imag(P0c) ** 2  # [B, T, F]
    Sf = _freq_smooth(P0, cfg.spp.mccdr.mcra.b)

    cap = 16 if sub <= 8 else 8  # VMEM-fit chunk shrinks with tile width
    tc = t_chunk or _pick_t_chunk(T, cap) or cap
    Tp = -(-T // tc) * tc

    def tiles3(a):  # [B, T, F] -> [Tp, nb, sub, fpad]
        a = jnp.moveaxis(a, 1, 0)  # [T, B, F]
        a = jnp.pad(a, [(0, Tp - T), (0, 0), (0, fpad - F)])
        return a.reshape(Tp, nb, sub, fpad)

    sf_in = tiles3(Sf)
    # time blocks, pre-padded one hop (frame t = [b_{t-1} | b_t]); channel
    # C is the FBF so Xf comes from the same in-kernel analysis pass
    al5 = jnp.concatenate([aligned, fbf[:, None, :]], axis=1)  # [B, C+1, S]
    sig = jnp.pad(al5, [(0, 0), (0, 0), (hop, 0)]).reshape(B, C + 1, T + 1, hop)
    if Tp != T:
        sig = jnp.pad(sig, [(0, 0), (0, 0), (0, Tp - T), (0, 0)])
    sig = jnp.transpose(sig, (2, 1, 0, 3))  # [Tp+1, C+1, B, hop]

    mc = cfg.spp.mccdr.mcra
    sp = cfg.spp
    Fn_np = np.zeros(fpad, dtype=np.float32)
    Fn_np[:F] = np.asarray(sp.mccdr.fn_pair(), dtype=np.float32)
    Fn_in = np.broadcast_to(Fn_np, (sub, fpad)).copy()
    CSF, ABF = (m.astype(np.float32) for m in fullbin_dft_matrices(n_fft, hop, fpad))

    kern = partial(
        _sgsc_kernel, Tc=tc, C=C, F=F, fpad=fpad, hop=hop, n_fft=n_fft,
        sp_alpha=sp.alpha, sp_alpha_d=sp.alpha_d, diag_min=sp.diag_min,
        diag_max=sp.diag_max, warmup=sp.warmup_frames, repair=sp.repair_frames,
        q_lo=sp.qband[0], q_hi=sp.qband[1], msc_alpha=sp.mccdr.alpha_msc,
        L=mc.L, alpha_s=mc.alpha_s, alpha_p=mc.alpha_p, alpha_d=mc.alpha_d,
        delta_s=mc.delta_s, p_min=mc.p_min, p_max=mc.p_max,
        bm_mu=cfg.bm.mu, bm_alpha=cfg.bm.alpha, aic_mu=cfg.aic.mu,
        aic_alpha=cfg.aic.alpha, af_eps=1e-4,
        freeze_thresh=cfg.aic_freeze_thresh, aic_warmup=cfg.aic_warmup_frames,
    )
    tile = lambda last: pl.BlockSpec((tc, 1, sub, last), lambda n, t: (t, n, 0, 0), memory_space=pltpu.VMEM)
    tile_c = lambda last: pl.BlockSpec((tc, 1, C, sub, last), lambda n, t: (t, n, 0, 0, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda n, t: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    sig_spec = pl.BlockSpec((tc, C + 1, sub, hop), lambda n, t: (t, 0, n, 0), memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, C + 1, sub, hop), lambda n, t: (t * tc + tc, 0, n, 0), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((C + 1, tc, sub, fpad), jnp.float32),  # Zr
        pltpu.VMEM((C + 1, tc, sub, fpad), jnp.float32),  # Zi
        pltpu.VMEM((16, sub, fpad), jnp.float32),  # PhiY
        pltpu.VMEM((16, sub, fpad), jnp.float32),  # PhiV
        pltpu.VMEM((4, sub, fpad), jnp.float32),  # Msc
        pltpu.VMEM((5, sub, fpad), jnp.float32),  # Mc (mcra)
        pltpu.VMEM((16, sub, fpad), jnp.float32),  # Wbm
        pltpu.VMEM((4, sub, fpad), jnp.float32),  # Pbm
        pltpu.VMEM((2, sub, fpad), jnp.float32),  # XfP
        pltpu.VMEM((C, sub, hop), jnp.float32),  # OlaBm
        pltpu.VMEM((C, sub, hop), jnp.float32),  # UPrev
        pltpu.VMEM((16, sub, fpad), jnp.float32),  # Waic
        pltpu.VMEM((8, sub, fpad), jnp.float32),  # UBuf
        pltpu.VMEM((1, sub, fpad), jnp.float32),  # Paic
        pltpu.VMEM((1, sub, hop), jnp.float32),  # OlaOut
    ]
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    out, p_out, bm_out = pl.pallas_call(
        kern,
        grid=(nb, Tp // tc),
        in_specs=[sig_spec, halo_spec, tile(fpad),
                  const(Fn_in.shape), const(CSF.shape), const(ABF.shape)],
        out_specs=[tile(hop), tile(fpad), tile_c(hop)],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, nb, sub, hop), jnp.float32),
            jax.ShapeDtypeStruct((Tp, nb, sub, fpad), jnp.float32),
            jax.ShapeDtypeStruct((Tp, nb, C, sub, hop), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=params,
    )(sig, sig, sf_in, jnp.asarray(Fn_in), jnp.asarray(CSF), jnp.asarray(ABF))

    out = out[:T].reshape(T, B, hop)
    out = jnp.moveaxis(out, 0, 1).reshape(B, T * hop)
    p = p_out[:T, ..., :F].reshape(T, B, F)
    p = jnp.moveaxis(p, 0, 1)
    bm = bm_out[:T].swapaxes(1, 2).reshape(T, C, B, hop)
    bm = jnp.transpose(bm, (2, 1, 0, 3)).reshape(B, C, T * hop)
    return out, p, bm
