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


def _measure(fn, *args, iters=12):
    fn(*args)
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(2):
        y = fn(*args)
    _sync(y)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 + iters):
        y = fn(*args)
    _sync(y)
    t2 = time.perf_counter() - t0
    return max((t2 - t1) / iters, 1e-9)


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
    Aj = jnp.asarray(A.astype(np.complex64))
    f = jax.jit(gauss_jordan_inv)
    per = _measure(f, Aj)
    n = B * F
    flops = n * (8.0 / 3.0) * (2 * M) ** 3  # complex GJ ~ 4x real mults
    bytes_ = Aj.size * 8 * 2
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
    st = subband_rls_init(cfg, (B,), cdtype=jnp.complex64)
    rng = np.random.default_rng(2)
    x = jnp.asarray((rng.standard_normal((B, cfg.half_bin)) + 1j * rng.standard_normal((B, cfg.half_bin))).astype(np.complex64))
    d = jnp.asarray((rng.standard_normal((B, cfg.half_bin)) + 1j * rng.standard_normal((B, cfg.half_bin))).astype(np.complex64))
    f = jax.jit(lambda s, a, b: subband_rls_step(cfg, s, a, b)[0].P)
    per = _measure(f, st, x, d)
    n = B * cfg.half_bin
    return {
        "kernel": "subband_rls_P_update_4x4c64",
        "per_call_ms": per * 1e3,
        "bins_per_s": n / per,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    for fn in (bench_stft, bench_cov_inverse, bench_subband_rls):
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v) for k, v in fn().items()}))


if __name__ == "__main__":
    main()
