"""Kernel micro-benchmarks vs speed-of-light estimates (SURVEY §7.10).

Measures the framework's hot kernels and prints one JSON line each with
the achieved rate and a roofline-style bound computed from the op's
FLOPs / bytes (TPU v5e ballpark: ~394 TFLOP/s bf16 MXU, ~197 f32,
~819 GB/s HBM — CPU numbers are only for smoke-testing the harness).

    python benchmarks/kernels.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

HBM_GBPS = 819.0
F32_TFLOPS = 197.0


def _sync(y):
    import jax
    import jax.numpy as jnp

    np.asarray(jax.device_get(jnp.ravel(jnp.abs(y) if jnp.iscomplexobj(y) else y)[:8]))


def _measure(fn, *args, iters=40):
    """Robust median-slope timing (cancels dispatch + fetch constants and
    raises on unreliable measurements instead of clamping — see
    runtime.profiling.slope_per_iter)."""
    from distantspeech_tpu.runtime.profiling import slope_per_iter

    fn(*args)
    _sync(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(*args)
        _sync(y)
        return time.perf_counter() - t0

    n1 = 4
    pairs = ((n1, n1 + iters), (n1 + 2, n1 + iters + 4), (n1 + 4, n1 + iters + 8))
    per, _ = slope_per_iter(run, pairs=pairs)
    return per


def bench_stft():
    import jax
    import jax.numpy as jnp

    from distantspeech_tpu.transform import StftConfig, analysis

    cfg = StftConfig(256, 128)
    B, C, S = 32, 8, 64000
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, C, S)).astype(np.float32))
    f = jax.jit(lambda a: analysis(a, cfg))
    per = _measure(f, x)
    T = S // 128
    frames = B * C * T
    flops = frames * 5 * 256 * np.log2(256)  # rfft flop model
    bytes_ = x.size * 4 * 2 + frames * 129 * 8
    return {
        "kernel": "stft_256",
        "per_call_ms": per * 1e3,
        "gflops": flops / per / 1e9,
        "hbm_gbps": bytes_ / per / 1e9,
        "bound": "HBM" if bytes_ / HBM_GBPS / 1e9 > flops / F32_TFLOPS / 1e12 else "MXU",
    }


def bench_cov_inverse():
    import jax
    import jax.numpy as jnp

    from distantspeech_tpu.stats.linalg import gauss_jordan_inv

    B, F, M = 32, 129, 8
    rng = np.random.default_rng(1)
    A = rng.standard_normal((B, F, M, M)) + 1j * rng.standard_normal((B, F, M, M))
    A = A @ np.conj(np.swapaxes(A, -1, -2)) + 10 * np.eye(M)
    # complex device transfer is UNIMPLEMENTED over the axon tunnel — ship
    # the real/imag planes and combine inside jit
    Ar = jnp.asarray(np.real(A).astype(np.float32))
    Ai = jnp.asarray(np.imag(A).astype(np.float32))
    f = jax.jit(lambda ar, ai: gauss_jordan_inv(jax.lax.complex(ar, ai)))
    per = _measure(f, Ar, Ai)
    n = B * F
    flops = n * (8.0 / 3.0) * (2 * M) ** 3  # complex GJ ~ 4x real mults
    bytes_ = A.size * 8 * 2
    return {
        "kernel": "gauss_jordan_inv_8x8c64",
        "per_call_ms": per * 1e3,
        "gflops": flops / per / 1e9,
        "hbm_gbps": bytes_ / per / 1e9,
        "matrices_per_s": n / per,
    }


def bench_subband_rls():
    import jax
    import jax.numpy as jnp

    from distantspeech_tpu.adaptive.subband import SubbandAfConfig, subband_rls_init, subband_rls_step

    cfg = SubbandAfConfig(num_bands=512, filter_len=4)
    B = 16
    rng = np.random.default_rng(2)
    xr = jnp.asarray(rng.standard_normal((2, B, cfg.half_bin)).astype(np.float32))
    dr = jnp.asarray(rng.standard_normal((2, B, cfg.half_bin)).astype(np.float32))

    @jax.jit
    def f(xr, dr):
        st = subband_rls_init(cfg, (B,), cdtype=jnp.complex64)
        x = jax.lax.complex(xr[0], xr[1])
        d = jax.lax.complex(dr[0], dr[1])
        return subband_rls_step(cfg, st, x, d)[0].P

    per = _measure(f, xr, dr)
    n = B * cfg.half_bin
    return {
        "kernel": "subband_rls_P_update_4x4c64",
        "per_call_ms": per * 1e3,
        "bins_per_s": n / per,
    }


def bench_pallas_mvdr():
    """The production MVDR frame-loop kernel (LDL^H + OM-LSA fused)."""
    import jax
    import jax.numpy as jnp

    from distantspeech_tpu.ops.pallas_mvdr import pallas_mvdr_scan

    T, B, F, M = 500, 32, 129, 8
    rng = np.random.default_rng(3)
    Zr = jnp.asarray(rng.standard_normal((T, B, F, M)).astype(np.float32))
    Zi = jnp.asarray(rng.standard_normal((T, B, F, M)).astype(np.float32))
    gate = np.zeros((T, B, F), np.float32)
    gate[:] = rng.random((T, B, F)) < 0.3
    gate[0] = 1.0
    gate = jnp.asarray(gate)
    p_spp = jnp.asarray(rng.random((T, B, F)).astype(np.float32))
    lam = jnp.asarray(rng.random((T, B, F)).astype(np.float32) + 0.1)
    sr = jnp.asarray(rng.standard_normal((F, M)).astype(np.float32))
    si = jnp.asarray(rng.standard_normal((F, M)).astype(np.float32))

    f = jax.jit(
        lambda zr, zi, g, pp, lm, ar, ai: pallas_mvdr_scan(
            zr + 1j * zi, g, ar + 1j * ai, p=pp, lam=lm
        )
    )
    per = _measure(f, Zr, Zi, gate, p_spp, lam, sr, si)
    # ~1500 f32 ops per (frame, element) incl. rank-1 update, LDL^H, solves, gain
    lanes = int(np.ceil(B * F / 1024.0)) * 1024
    flops = 1500.0 * T * lanes
    vpu_tflops = 2.0  # v5e VPU f32 ballpark
    return {
        "kernel": "pallas_mvdr_omlsa_frameloop_8mic",
        "per_call_ms": per * 1e3,
        "gflops": flops / per / 1e9,
        "pct_vpu_roofline": 100.0 * flops / per / (vpu_tflops * 1e12),
        "frames_per_s": T * B / per,
    }


def bench_dft_matmul():
    """Windowed-DFT-as-matmul STFT (the production analysis path)."""
    import jax
    import jax.numpy as jnp

    from distantspeech_tpu.transform import StftConfig
    from distantspeech_tpu.transform.stft import stft_frames

    cfg = StftConfig(256, 128)
    B, C, S = 32, 8, 64000
    x = jnp.asarray(np.random.default_rng(4).standard_normal((B, C, S)).astype(np.float32))
    f = jax.jit(lambda a: stft_frames(a, cfg))
    per = _measure(f, x)
    T = (S - 256) // 128 + 1
    frames = B * C * T
    flops = 2.0 * frames * 256 * 258  # one [.., 256] @ [256, 258] matmul
    bytes_ = frames * 256 * 4 + frames * 258 * 4
    return {
        "kernel": "stft_dft_matmul_256",
        "per_call_ms": per * 1e3,
        "tflops": flops / per / 1e12,
        "hbm_gbps": bytes_ / per / 1e9,
        "bound": "HBM" if bytes_ / HBM_GBPS / 1e9 > flops / F32_TFLOPS / 1e12 else "MXU",
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    benches = [bench_stft, bench_dft_matmul, bench_cov_inverse, bench_subband_rls]
    if not args.cpu:  # the Pallas kernel needs a real TPU (or interpret mode)
        benches.append(bench_pallas_mvdr)
    for fn in benches:
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v) for k, v in fn().items()}))


if __name__ == "__main__":
    main()
