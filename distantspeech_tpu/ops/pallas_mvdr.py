"""Pallas TPU kernel: the fused MVDR frame recursion.

The flagship pipeline's hot loop is a ``lax.scan`` over frames whose carry
(the per-bin noise covariance and its inverse) round-trips through HBM every
iteration and whose per-step ops each pay loop overhead.  This kernel runs
the ENTIRE frame loop inside ``pallas_call``: the covariance state lives in
VMEM scratch across all frames, the per-frame work is an unrolled complex
Gauss-Jordan inverse and MVDR weight evaluation, and HBM is touched once per
frame for input/output only.

Layout (the part that makes it fast): TPU vregs are (8 sublanes, 128 lanes).
Frequency bins fill the lane axis and a tile of 8 batch items fills the
sublane axis, so every elementwise op in the recursion runs on full vregs —
a lanes-only layout leaves 7/8 of the VPU idle (measured: same speed as the
XLA scan).  The frame axis is chunked through the innermost grid dimension;
the covariance scratch persists across chunks (TPU grid cells execute
sequentially), so T is unbounded without blowing VMEM.

Split-complex throughout (TPU has no native complex).  The MCRA gate p is
computed OUTSIDE (a cheap elementwise jnp scan) and fed in as a [T, B, F]
gate mask — keeping the cross-bin smoothing halo out of the kernel.

The jnp reference semantics (beamform.mvdr.mvdr_step without the MCRA part)
are reproduced exactly; ``tests/test_pallas_mvdr.py`` checks the kernel in
interpreter mode against the scan.  Oracle for the recursion itself:
/root/reference/DistantSpeech/beamformer/adaptivebeamformer.py:86-105.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8  # sublane tile: batch items per grid cell


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _gj_inverse_rows(work_r, work_i, M):
    """Fully unrolled Gauss-Jordan on split-complex ``work``: nested Python
    lists ``work[r][c]`` of vreg-shaped arrays (no scatter/dynamic-update —
    those don't lower in Pallas TC kernels; the unroll is pure VPU math)."""
    for k in range(M):
        pr, pi = work_r[k][k], work_i[k][k]
        den = pr * pr + pi * pi
        inv_r, inv_i = pr / den, -pi / den
        row_r = [None] * (2 * M)
        row_i = [None] * (2 * M)
        for c in range(2 * M):
            row_r[c], row_i[c] = _cmul(work_r[k][c], work_i[k][c], inv_r, inv_i)
        for r in range(M):
            if r == k:
                continue
            cr, ci = work_r[r][k], work_i[r][k]
            for c in range(2 * M):
                dr, di = _cmul(row_r[c], row_i[c], cr, ci)
                work_r[r][c] = work_r[r][c] - dr
                work_i[r][c] = work_i[r][c] - di
        work_r[k] = row_r
        work_i[k] = row_i
    return work_r, work_i


def _mvdr_kernel(
    zr_ref, zi_ref, gate_ref, ar_ref, ai_ref,  # inputs
    yr_ref, yi_ref,  # outputs
    Rr, Ri, Wr, Wi,  # scratch: covariance + inverse, [M, M, 8, Ft]
    *, Tc: int, M: int, alpha_v: float, diag: float,
):
    beta = 1.0 - alpha_v

    @pl.when(pl.program_id(2) == 0)
    def _init():
        Rr[...] = jnp.zeros_like(Rr)
        Ri[...] = jnp.zeros_like(Ri)
        Wr[...] = jnp.zeros_like(Wr)
        Wi[...] = jnp.zeros_like(Wi)

    ar = ar_ref[...]  # steering [M, Ft] — broadcasts over the sublane axis
    ai = ai_ref[...]

    def frame(t, _):
        zr = zr_ref[0, t]  # [M, 8, Ft]
        zi = zi_ref[0, t]
        g = gate_ref[0, t]  # [8, Ft] in {0,1}: update noise covariance?
        upd = g > 0.5

        # --- gated rank-1 covariance update (mvdr_step:82-88) --------------
        for a_ in range(M):
            for b_ in range(M):
                # z_a * conj(z_b)
                outr = zr[a_] * zr[b_] + zi[a_] * zi[b_]
                outi = zi[a_] * zr[b_] - zr[a_] * zi[b_]
                Rr[a_, b_] = jnp.where(upd, alpha_v * Rr[a_, b_] + beta * outr, Rr[a_, b_])
                Ri[a_, b_] = jnp.where(upd, alpha_v * Ri[a_, b_] + beta * outi, Ri[a_, b_])

        # --- inverse of (R + diag I), held when not updating ---------------
        shp = g.shape
        zero = jnp.zeros(shp, dtype=jnp.float32)
        one = jnp.ones(shp, dtype=jnp.float32)
        work_r = [
            [Rr[r, c] + (diag if r == c else 0.0) for c in range(M)]
            + [one if r == c else zero for c in range(M)]
            for r in range(M)
        ]  # [M][2M] of [8, Ft]
        work_i = [[Ri[r, c] for c in range(M)] + [zero] * M for r in range(M)]
        work_r, work_i = _gj_inverse_rows(work_r, work_i, M)
        for r in range(M):
            for c in range(M):
                Wr[r, c] = jnp.where(upd, work_r[r][M + c], Wr[r, c])
                Wi[r, c] = jnp.where(upd, work_i[r][M + c], Wi[r, c])

        # --- w = R^-1 a / (a^H R^-1 a); y = w^H z (mvdr_step:90-91) --------
        num_r = [None] * M
        num_i = [None] * M
        for r in range(M):
            sr = jnp.zeros(shp, dtype=jnp.float32)
            si = jnp.zeros(shp, dtype=jnp.float32)
            for c in range(M):
                tr, ti = _cmul(Wr[r, c], Wi[r, c], ar[c], ai[c])
                sr, si = sr + tr, si + ti
            num_r[r], num_i[r] = sr, si
        den_r = jnp.zeros(shp, dtype=jnp.float32)
        den_i = jnp.zeros(shp, dtype=jnp.float32)
        for r in range(M):
            tr, ti = _cmul(ar[r], -ai[r], num_r[r], num_i[r])  # conj(a) * num
            den_r, den_i = den_r + tr, den_i + ti
        dmag = den_r * den_r + den_i * den_i
        dinv_r, dinv_i = den_r / dmag, -den_i / dmag

        yr = jnp.zeros(shp, dtype=jnp.float32)
        yi = jnp.zeros(shp, dtype=jnp.float32)
        for r in range(M):
            wr_, wi_ = _cmul(num_r[r], num_i[r], dinv_r, dinv_i)
            # conj(w) * z
            tr, ti = _cmul(wr_, -wi_, zr[r], zi[r])
            yr, yi = yr + tr, yi + ti
        yr_ref[0, t] = yr
        yi_ref[0, t] = yi
        return 0

    jax.lax.fori_loop(0, Tc, frame, 0)


def pallas_mvdr_scan(
    Z: jnp.ndarray, gate: jnp.ndarray, steer: jnp.ndarray,
    alpha_v: float = 0.9998, diag: float = 1e-6,
    f_tile: int = 128, t_chunk: int = 64, interpret: bool = False,
) -> jnp.ndarray:
    """Fused MVDR frame loop.

    Z: [T, B, F, M] complex64 spectra; gate: [T, B, F] float (1 = update the
    noise covariance this frame, the ``p < p_vad`` MCRA decision);
    steer: [F, M] complex steering vectors.
    Returns Y [T, B, F] complex64.  Matches ``mvdr_step`` without MCRA.

    B pads up to a multiple of 8 (sublane tile), F to ``f_tile`` (lanes),
    T to ``t_chunk`` (frame chunks streamed through the innermost grid dim
    with the covariance carry resident in VMEM scratch).
    """
    T, B, F, M = Z.shape
    Fp = int(np.ceil(F / f_tile) * f_tile)
    Bp = int(np.ceil(B / _SUB) * _SUB)
    Tp = int(np.ceil(T / t_chunk) * t_chunk)
    # padded frames carry gate=0 and z=0: covariance/inverse are held and the
    # padded outputs (sliced off below) stay finite
    Zp = jnp.pad(Z, [(0, Tp - T), (0, Bp - B), (0, Fp - F), (0, 0)])
    gatep = jnp.pad(gate, [(0, Tp - T), (0, Bp - B), (0, Fp - F)])
    steerp = jnp.pad(steer, [(0, Fp - F), (0, 0)], constant_values=1.0)

    # split-complex; batch tile on the sublane axis, bins on the lane axis:
    # [B/8, T, M, 8, Fp]
    def to_tiles(x):  # [T, B, F, M] real -> [B/8, T, M, 8, Fp]
        x = jnp.transpose(x, (1, 0, 3, 2))  # [B, T, M, F]
        x = x.reshape(Bp // _SUB, _SUB, Tp, M, Fp)
        return jnp.transpose(x, (0, 2, 3, 1, 4)).astype(jnp.float32)

    zr = to_tiles(jnp.real(Zp))
    zi = to_tiles(jnp.imag(Zp))
    ar = jnp.moveaxis(jnp.real(steerp), -1, -2).astype(jnp.float32)  # [M, Fp]
    ai = jnp.moveaxis(jnp.imag(steerp), -1, -2).astype(jnp.float32)
    g = jnp.transpose(
        jnp.moveaxis(gatep, 0, 1).reshape(Bp // _SUB, _SUB, Tp, Fp), (0, 2, 1, 3)
    ).astype(jnp.float32)  # [B/8, T, 8, Fp]

    grid = (Bp // _SUB, Fp // f_tile, Tp // t_chunk)  # t innermost: scratch carries

    kern = partial(_mvdr_kernel, Tc=t_chunk, M=M, alpha_v=alpha_v, diag=diag)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t_chunk, M, _SUB, f_tile), lambda b, f, t: (b, t, 0, 0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_chunk, M, _SUB, f_tile), lambda b, f, t: (b, t, 0, 0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_chunk, _SUB, f_tile), lambda b, f, t: (b, t, 0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, f_tile), lambda b, f, t: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, f_tile), lambda b, f, t: (0, f), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_chunk, _SUB, f_tile), lambda b, f, t: (b, t, 0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_chunk, _SUB, f_tile), lambda b, f, t: (b, t, 0, f), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp // _SUB, Tp, _SUB, Fp), jnp.float32),
            jax.ShapeDtypeStruct((Bp // _SUB, Tp, _SUB, Fp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, M, _SUB, f_tile), jnp.float32),
            pltpu.VMEM((M, M, _SUB, f_tile), jnp.float32),
            pltpu.VMEM((M, M, _SUB, f_tile), jnp.float32),
            pltpu.VMEM((M, M, _SUB, f_tile), jnp.float32),
        ],
        interpret=interpret,
    )(zr, zi, g, ar, ai)

    # [B/8, T, 8, Fp] -> [T, B, F]
    Y = (yr + 1j * yi).transpose(1, 0, 2, 3).reshape(Tp, Bp, Fp)
    return Y[:T, :B, :F].astype(Z.dtype)
