"""Pallas TPU kernel: the fused MVDR frame recursion.

The flagship pipeline's hot loop is a ``lax.scan`` over frames whose carry
(the per-bin noise covariance and its inverse) round-trips through HBM every
iteration and whose per-step ops each pay loop overhead.  This kernel runs
the ENTIRE frame loop for a (batch, bin-tile) grid cell inside one
``pallas_call``: the covariance state lives in VMEM scratch for all T
frames, the per-frame work is an unrolled complex Gauss-Jordan inverse and
MVDR weight evaluation vectorised across the bin lanes, and HBM is touched
once per frame for input/output only.

Split-complex layout (TPU has no native complex): every complex array is a
pair of float32 planes; bins sit on the 128-lane axis.  The MCRA gate p is
computed OUTSIDE (a cheap elementwise jnp scan) and fed in as a [T, F] gate
mask — keeping the cross-bin smoothing halo out of the kernel.

The jnp reference semantics (beamform.mvdr.mvdr_step without the MCRA part)
are reproduced exactly; ``tests/test_pallas_mvdr.py`` checks the kernel in
interpreter mode against the scan.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _gj_inverse_rows(work_r, work_i, M):
    """Unrolled Gauss-Jordan on split-complex ``work`` [M, 2M, F] lanes."""
    for k in range(M):
        pr, pi = work_r[k, k], work_i[k, k]
        den = pr * pr + pi * pi
        inv_r, inv_i = pr / den, -pi / den
        # pivot row scaled
        row_r, row_i = _cmul(work_r[k], work_i[k], inv_r, inv_i)  # [2M, F]
        for r in range(M):
            if r == k:
                continue
            cr, ci = work_r[r, k], work_i[r, k]
            dr, di = _cmul(row_r, row_i, cr, ci)
            work_r = work_r.at[r].set(work_r[r] - dr)
            work_i = work_i.at[r].set(work_i[r] - di)
        work_r = work_r.at[k].set(row_r)
        work_i = work_i.at[k].set(row_i)
    return work_r, work_i


def _mvdr_kernel(
    zr_ref, zi_ref, gate_ref, ar_ref, ai_ref,  # inputs
    yr_ref, yi_ref,  # outputs
    Rr, Ri, Wr, Wi,  # scratch: covariance + inverse, [M, M, Ft]
    *, T: int, M: int, alpha_v: float, diag: float,
):
    beta = 1.0 - alpha_v
    Rr[...] = jnp.zeros_like(Rr)
    Ri[...] = jnp.zeros_like(Ri)
    Wr[...] = jnp.zeros_like(Wr)
    Wi[...] = jnp.zeros_like(Wi)

    ar = ar_ref[...]  # steering [M, Ft]
    ai = ai_ref[...]

    def frame(t, _):
        zr = zr_ref[t, 0]  # [M, Ft] (block batch dim is 1)
        zi = zi_ref[t, 0]
        g = gate_ref[t, 0]  # [Ft] in {0,1}: update noise covariance?

        # --- gated rank-1 covariance update (mvdr_step:82-88) --------------
        for a_ in range(M):
            for b_ in range(M):
                # z_a * conj(z_b)
                outr = zr[a_] * zr[b_] + zi[a_] * zi[b_]
                outi = zi[a_] * zr[b_] - zr[a_] * zi[b_]
                new_r = alpha_v * Rr[a_, b_] + beta * outr
                new_i = alpha_v * Ri[a_, b_] + beta * outi
                Rr[a_, b_] = jnp.where(g > 0.5, new_r, Rr[a_, b_])
                Ri[a_, b_] = jnp.where(g > 0.5, new_i, Ri[a_, b_])

        # --- inverse of (R + diag I), held when not updating ---------------
        Ft = zr.shape[-1]
        eye = [[1.0 if i == j else 0.0 for j in range(M)] for i in range(M)]
        work_r = jnp.stack(
            [jnp.concatenate(
                [jnp.stack([Rr[r, c] + (diag if r == c else 0.0) for c in range(M)]),
                 jnp.stack([jnp.full((Ft,), eye[r][c], dtype=Rr.dtype) for c in range(M)])], axis=0)
             for r in range(M)], axis=0)  # [M, 2M, Ft]
        work_i = jnp.stack(
            [jnp.concatenate(
                [jnp.stack([Ri[r, c] for c in range(M)]),
                 jnp.zeros((M, Ft), dtype=Ri.dtype)], axis=0)
             for r in range(M)], axis=0)
        work_r, work_i = _gj_inverse_rows(work_r, work_i, M)
        for r in range(M):
            for c in range(M):
                Wr[r, c] = jnp.where(g > 0.5, work_r[r, M + c], Wr[r, c])
                Wi[r, c] = jnp.where(g > 0.5, work_i[r, M + c], Wi[r, c])

        # --- w = R^-1 a / (a^H R^-1 a); y = w^H z (mvdr_step:90-91) --------
        num_r = [None] * M
        num_i = [None] * M
        for r in range(M):
            sr = jnp.zeros_like(ar[0])
            si = jnp.zeros_like(ar[0])
            for c in range(M):
                tr, ti = _cmul(Wr[r, c], Wi[r, c], ar[c], ai[c])
                sr, si = sr + tr, si + ti
            num_r[r], num_i[r] = sr, si
        den_r = jnp.zeros_like(ar[0])
        den_i = jnp.zeros_like(ar[0])
        for r in range(M):
            tr, ti = _cmul(ar[r], -ai[r], num_r[r], num_i[r])  # conj(a) * num
            den_r, den_i = den_r + tr, den_i + ti
        dmag = den_r * den_r + den_i * den_i
        dinv_r, dinv_i = den_r / dmag, -den_i / dmag

        yr = jnp.zeros_like(ar[0])
        yi = jnp.zeros_like(ar[0])
        for r in range(M):
            wr_, wi_ = _cmul(num_r[r], num_i[r], dinv_r, dinv_i)
            # conj(w) * z
            tr, ti = _cmul(wr_, -wi_, zr[r], zi[r])
            yr, yi = yr + tr, yi + ti
        yr_ref[t, 0] = yr
        yi_ref[t, 0] = yi
        return 0

    jax.lax.fori_loop(0, T, frame, 0)


def pallas_mvdr_scan(
    Z: jnp.ndarray, gate: jnp.ndarray, steer: jnp.ndarray,
    alpha_v: float = 0.9998, diag: float = 1e-6,
    f_tile: int = 128, interpret: bool = False,
) -> jnp.ndarray:
    """Fused MVDR frame loop.

    Z: [T, B, F, M] complex64 spectra; gate: [T, B, F] float (1 = update the
    noise covariance this frame, the ``p < p_vad`` MCRA decision);
    steer: [F, M] complex steering vectors.
    Returns Y [T, B, F] complex64.  Matches ``mvdr_step`` without MCRA.
    """
    T, B, F, M = Z.shape
    Fp = int(np.ceil(F / f_tile) * f_tile)
    padF = [(0, 0), (0, 0), (0, Fp - F), (0, 0)]
    Zp = jnp.pad(Z, padF)
    gatep = jnp.pad(gate, [(0, 0), (0, 0), (0, Fp - F)])
    steerp = jnp.pad(steer, [(0, Fp - F), (0, 0)], constant_values=1.0)

    # split-complex, lanes-last layouts
    zr = jnp.moveaxis(jnp.real(Zp), -1, -2).astype(jnp.float32)  # [T, B, M, Fp]
    zi = jnp.moveaxis(jnp.imag(Zp), -1, -2).astype(jnp.float32)
    ar = jnp.moveaxis(jnp.real(steerp), -1, -2).astype(jnp.float32)  # [M, Fp]
    ai = jnp.moveaxis(jnp.imag(steerp), -1, -2).astype(jnp.float32)
    g = gatep.astype(jnp.float32)

    n_ft = Fp // f_tile
    grid = (B, n_ft)

    kern = partial(_mvdr_kernel, T=T, M=M, alpha_v=alpha_v, diag=diag)
    yr, yi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, 1, M, f_tile), lambda b, f: (0, b, 0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1, M, f_tile), lambda b, f: (0, b, 0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1, f_tile), lambda b, f: (0, b, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, f_tile), lambda b, f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, f_tile), lambda b, f: (0, f), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, 1, f_tile), lambda b, f: (0, b, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1, f_tile), lambda b, f: (0, b, f), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Fp), jnp.float32),
            jax.ShapeDtypeStruct((T, B, Fp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, M, f_tile), jnp.float32),
            pltpu.VMEM((M, M, f_tile), jnp.float32),
            pltpu.VMEM((M, M, f_tile), jnp.float32),
            pltpu.VMEM((M, M, f_tile), jnp.float32),
        ],
        interpret=interpret,
    )(
        zr.reshape(T, B, M, Fp), zi.reshape(T, B, M, Fp), g, ar, ai
    )
    Y = (yr + 1j * yi)[:, :, :F]
    return Y.astype(Z.dtype)
