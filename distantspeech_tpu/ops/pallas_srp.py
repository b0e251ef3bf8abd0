"""Fused SRP-PHAT angle spectrum: per-bin steered power accumulated on-chip.

Oracle: srp.compute_angle_spectrum (/root/reference/DistantSpeech/doa/
srp.py:17-53) as restructured by doa/srp.py (PHAT whitening folded into one
pass, angle grid as a contraction).

Why this exists: the XLA path's einsum contracts only over the M=8 mic
axis, so it materialises the [T, B, Theta, F] complex steered field in HBM
(~1.5 GB at the benchmark shape) before the |.|-over-bins reduction —
measured 9.0 of the 8.9 ms srp_process iteration at B=8 (the MCRA track is
0.7 ms).  This kernel keeps the per-bin steered tile in VMEM: for each bin
f it computes the complex response of all 360 angles as ONE real matmul
([rows, 2M] @ [2M, 2*Theta_pad] against a per-bin packed grid constant),
takes the magnitude in-register, and accumulates into the [rows, Theta]
output — the full-size steered field never exists in HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _srp_kernel(y_ref, g_ref, out_ref, acc, *, F: int, R: int, tpad: int, unroll: int):
    """y [R, F, 2M] whitened spectra rows; g [F, 2M, 2*tpad] packed grids.
    out [R, tpad] = sum_f |steered response|."""
    acc[...] = jnp.zeros_like(acc)

    def f_step(f, _):
        z = jnp.dot(y_ref[:, f], g_ref[f], precision="highest",
                    preferred_element_type=jnp.float32)  # [R, 2*tpad]
        re, im = z[:, :tpad], z[:, tpad:]
        acc[...] += jnp.sqrt(re * re + im * im)
        return 0

    jax.lax.fori_loop(0, F, f_step, 0, unroll=unroll)
    out_ref[...] = acc[...]


def fused_srp_spectrum(
    Y_tfm: jnp.ndarray, grid: np.ndarray, phat: bool = True,
    interpret: bool = None, rows: int = 64, unroll: int = 1,
) -> jnp.ndarray:
    """Angle spectrum of a spectrogram, fused.

    Y_tfm: [T, ..., F, M] complex; grid: [Theta, F, M] complex (host
    constant).  Returns [T, ..., Theta] — `doa.srp.srp_angle_spectrum`
    semantics to float32 rounding."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    grid = np.asarray(grid)
    Theta, F, M = grid.shape
    tpad = -(-Theta // 128) * 128
    lead = Y_tfm.shape[:-2]
    n = int(np.prod(lead)) if lead else 1

    if phat:
        Yw = Y_tfm / (jnp.abs(Y_tfm) + 1e-6)
    else:
        Yw = Y_tfm
    y2 = jnp.concatenate([jnp.real(Yw), jnp.imag(Yw)], axis=-1).reshape(n, F, 2 * M)
    npad = -(-n // rows) * rows
    if npad != n:
        y2 = jnp.pad(y2, [(0, npad - n), (0, 0), (0, 0)])

    # packed per-bin grid: acc = y @ G with y = [re | im] and
    # G = [[Gr, -Gi], [Gi, Gr]]  (conj(a) contraction: acc = sum_m a*_m y_m)
    Gr = np.real(grid).transpose(1, 2, 0)  # [F, M, Theta]
    Gi = np.imag(grid).transpose(1, 2, 0)
    G = np.zeros((F, 2 * M, 2 * tpad), dtype=np.float32)
    G[:, :M, :Theta] = Gr
    G[:, M:, :Theta] = Gi  # re(a* y) = Gr yr + Gi yi
    G[:, :M, tpad : tpad + Theta] = -Gi  # im(a* y) = Gr yi - Gi yr
    G[:, M:, tpad : tpad + Theta] = Gr

    yspec = pl.BlockSpec((rows, F, 2 * M), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec(G.shape, lambda r: (0, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((rows, tpad), lambda r: (r, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_srp_kernel, F=F, R=rows, tpad=tpad, unroll=unroll),
        grid=(npad // rows,),
        in_specs=[yspec, gspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((npad, tpad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, tpad), jnp.float32)],
        interpret=interpret,
    )(y2, jnp.asarray(G))
    return out[:n, :Theta].reshape(*lead, Theta) if lead else out[0, :Theta]
