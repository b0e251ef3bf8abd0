"""In-process A/B of the GSC-family frame-scan ``unroll`` on the real TPU.

The GSC pipelines sit at ~35-190 audio-s/s (PIPELINES_r03.json) with a
serial-recursion floor; their scans run unroll=1 while the flagship paths
use unroll=8.  ``unroll`` is a pure lowering hint (numerics identical), so
this A/B only has to answer a speed question.  Interleaved medians, same
discipline as ab_fused.py (docs/performance.md "Benchmarking").

Usage: python -u benchmarks/ab_gsc.py [--cpu] [--batch N] [--pipeline gsc]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--pipeline", default="gsc", choices=["gsc", "tdgsc", "fdgsc"])
    ap.add_argument("--unrolls", default="1,4,8")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distantspeech_tpu.array.geometry import ArrayGeometry

    fs = 16000
    B = args.batch
    S = int(args.seconds * fs) // 128 * 128
    geom4 = ArrayGeometry.linear(4, 0.032, fs=fs)
    ang = (np.pi / 2, 0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 4, S)).astype(np.float32))
    audio_s = B * args.seconds

    if args.pipeline == "gsc":
        from distantspeech_tpu.beamform import GscConfig, gsc_process

        cfg = GscConfig(n_mics=4, normalize_aic=True, spp_rel_diag=1e-5)
        mk = lambda u: jax.jit(lambda xx: gsc_process(xx, geom4, ang, cfg, unroll=u))
    elif args.pipeline == "tdgsc":
        from distantspeech_tpu.beamform import TdGscConfig, tdgsc_process

        cfg = TdGscConfig(n_mics=4)
        mk = lambda u: jax.jit(lambda xx: tdgsc_process(xx, geom4, ang, cfg, unroll=u)[0])
    else:
        from distantspeech_tpu.beamform import FdGscConfig, fdgsc_process

        cfg = FdGscConfig(n_mics=4)
        mk = lambda u: jax.jit(lambda xx: fdgsc_process(xx, geom4, ang, cfg, unroll=u)[0])

    unrolls = [int(u) for u in args.unrolls.split(",")]
    variants = {f"unroll{u}": mk(u) for u in unrolls}

    def make_timed(fn):
        def timed(iters):
            t0 = time.perf_counter()
            xi = x
            for _ in range(iters):
                y = fn(xi)
                xi = x + 0.0 * y[:, None, :1]
            s = float(jax.device_get(jnp.sum(y[:, :16])))
            assert np.isfinite(s), s
            return time.perf_counter() - t0
        return timed

    timers = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        timers[name] = make_timed(fn)
        timers[name](1)
        print(f"[{name}] compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        timers[name](1)

    # unroll is numerically inert, but assert it anyway (cheap)
    ys = {name: fn(x) for name, fn in variants.items()}
    y0 = ys[f"unroll{unrolls[0]}"]
    for name, y in ys.items():
        rel = float(jax.device_get(jnp.max(jnp.abs(y - y0)) / jnp.maximum(jnp.max(jnp.abs(y0)), 1e-20)))
        assert rel < 1e-5, (name, rel)
        print(f"[{name}] parity vs unroll{unrolls[0]}: {rel:.2e}", file=sys.stderr)

    LO, HI = 2, 12  # each GSC iter is tens of ms; 10-iter span ~ O(1 s) device work
    slopes = {name: [] for name in variants}
    for r in range(args.rounds):
        for name, t in timers.items():
            lo, hi = t(LO), t(HI)
            slopes[name].append((hi - lo) / (HI - LO))
            print(f"round {r} [{name}] {slopes[name][-1]*1e3:.2f} ms/iter", file=sys.stderr)

    results = {}
    for name, ss in slopes.items():
        med = float(np.median(ss))
        results[name] = {
            "batch": B,
            "ms_per_iter_median": round(med * 1e3, 2),
            "audio_s_per_s_median": round(audio_s / med, 1),
        }
        print(f"[{name}] {results[name]}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
