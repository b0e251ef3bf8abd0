"""Batched on-device image-source room simulation — the gpuRIR analogue.

The reference optionally offloads RIR generation to the gpuRIR CUDA
library (/root/reference/DistantSpeech/beamformer/ArraySim.py:92-138); this
is the TPU-native equivalent: the Allen-Berkley image-source model as one
jitted tensor program, batched over sources and mics, with static shapes.

Design (TPU-first, not a scatter port of sim/room.py):

- The image lattice for a shoebox is ``(2*(2N+1))^3`` positions with
  per-axis reflection counts that are *constants* given ``max_order``;
  images beyond order N stay in the tensor with amplitude 0 (static shape).
- The band-limited impulse placement is evaluated DENSELY: each image
  contributes ``amp * hann(u) * sinc(u - frac)`` on its 81-sample support,
  expressed as a masked function of the absolute time axis — no
  ``scatter_add`` (serial and slow on TPU), just vectorised VPU math
  accumulated with ``lax.scan`` over image blocks.
- Numerics match ``sim.room.image_source_rir`` (the host fixture path) to
  float32 round-off: same Hann sampling at integer offsets from
  ``floor(delay)``, same sinc centring at the fractional delay, same
  ``1/(4 pi max(d, 1e-2))`` spreading.

Use for large fixture banks (many sources x arrays) where the host loop is
the bottleneck; ``sim.room`` remains the small-fixture reference.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from distantspeech_tpu.sim.room import RoomConfig


def _axis_reflections(max_order: int) -> np.ndarray:
    """Per-axis reflection counts for the (even, odd) parity images."""
    n = np.arange(-max_order, max_order + 1)
    return np.concatenate([2 * np.abs(n), np.abs(2 * n - 1)])


def default_rir_length(cfg: RoomConfig, sinc_width: int = 81) -> int:
    """Static upper bound on the RIR length for ``cfg`` (host-side)."""
    if cfg.rir_length is not None:
        return int(cfg.rir_length)
    reach = (2 * cfg.max_order + 1) * np.linalg.norm(cfg.size)
    return int(np.ceil(reach / cfg.c * cfg.fs)) + sinc_width + 1


def _axis_positions(x: jnp.ndarray, L_ax: float, max_order: int) -> jnp.ndarray:
    n = jnp.arange(-max_order, max_order + 1, dtype=x.dtype)
    return jnp.concatenate([2.0 * n * L_ax + x, 2.0 * n * L_ax - x])


@partial(jax.jit, static_argnames=("cfg", "rir_length", "sinc_width", "block"))
def batched_rir(
    srcs: jnp.ndarray,
    mics: jnp.ndarray,
    cfg: RoomConfig = RoomConfig(),
    rir_length: int | None = None,
    sinc_width: int = 81,
    block: int = 64,
) -> jnp.ndarray:
    """RIRs for every (source, mic) pair in one jitted program.

    srcs: [B, 3] source positions; mics: [M, 3] -> rir [B, M, L] float32.
    ``rir_length`` must be static (default: ``default_rir_length(cfg)``).
    """
    L = rir_length or default_rir_length(cfg, sinc_width)
    N = cfg.max_order
    srcs = jnp.asarray(srcs, dtype=jnp.float32)
    mics = jnp.asarray(mics, dtype=jnp.float32)

    # reflection counts are compile-time constants of the lattice
    r_ax = _axis_reflections(N).astype(np.float32)
    R = (r_ax[:, None, None] + r_ax[None, :, None] + r_ax[None, None, :]).reshape(-1)
    gain = np.where(R <= N, float(cfg.reflection) ** R, 0.0).astype(np.float32)  # [I]

    def one_source(src):
        px = _axis_positions(src[0], cfg.size[0], N)
        py = _axis_positions(src[1], cfg.size[1], N)
        pz = _axis_positions(src[2], cfg.size[2], N)
        P = jnp.stack(
            [
                jnp.broadcast_to(px[:, None, None], (px.size, py.size, pz.size)),
                jnp.broadcast_to(py[None, :, None], (px.size, py.size, pz.size)),
                jnp.broadcast_to(pz[None, None, :], (px.size, py.size, pz.size)),
            ],
            axis=-1,
        ).reshape(-1, 3)  # [I, 3]

        d = jnp.linalg.norm(P[None, :, :] - mics[:, None, :], axis=-1)  # [M, I]
        amp = jnp.asarray(gain)[None, :] / (4.0 * jnp.pi * jnp.maximum(d, 1e-2))
        delay = d / cfg.c * cfg.fs  # fractional samples [M, I]

        I = P.shape[0]
        Ip = int(np.ceil(I / block) * block)
        amp = jnp.pad(amp, ((0, 0), (0, Ip - I)))
        delay = jnp.pad(delay, ((0, 0), (0, Ip - I)))
        amp_b = amp.reshape(mics.shape[0], Ip // block, block).swapaxes(0, 1)
        del_b = delay.reshape(mics.shape[0], Ip // block, block).swapaxes(0, 1)

        half = sinc_width // 2
        t = jnp.arange(L, dtype=jnp.float32)

        def body(acc, ad):
            a, dl = ad  # [M, blk]
            di = jnp.floor(dl)
            frac = dl - di
            u = t[None, None, :] - di[..., None]  # [M, blk, L] integer offsets
            inside = (u >= -half) & (u <= half)
            # np.hanning(W) sampled at integer offset u+half from the window start
            hann = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * (u + half) / (sinc_width - 1)))
            taps = a[..., None] * hann * jnp.sinc(u - frac[..., None])
            return acc + jnp.sum(jnp.where(inside, taps, 0.0), axis=1), None

        acc0 = jnp.zeros((mics.shape[0], L), dtype=jnp.float32)
        rir, _ = jax.lax.scan(body, acc0, (amp_b, del_b))
        return rir

    return jax.vmap(one_source)(srcs)


@partial(jax.jit, static_argnames=("cfg", "rir_length", "sinc_width"))
def batched_propagation(
    signals: jnp.ndarray,
    srcs: jnp.ndarray,
    mics: jnp.ndarray,
    cfg: RoomConfig = RoomConfig(),
    rir_length: int | None = None,
    sinc_width: int = 81,
) -> jnp.ndarray:
    """Convolve each dry source with its RIRs on device via FFT.

    signals: [B, S]; srcs: [B, 3]; mics: [M, 3] -> wet [B, M, S].
    """
    rir = batched_rir(srcs, mics, cfg, rir_length=rir_length, sinc_width=sinc_width)
    S = signals.shape[-1]
    n = S + rir.shape[-1] - 1
    nfft = 1 << (n - 1).bit_length()
    X = jnp.fft.rfft(signals, n=nfft, axis=-1)  # [B, F]
    H = jnp.fft.rfft(rir, n=nfft, axis=-1)  # [B, M, F]
    y = jnp.fft.irfft(X[:, None, :] * H, n=nfft, axis=-1)
    return y[..., :S]
