"""BASELINE config-5 batch clause: the full stack at B = 64..1024.

"batched 1024 utterances" (BASELINE.json config 5) — measures
``full_stack_process`` at growing batch sizes on the attached device, for
BOTH backends (scan and the 3-kernel fused chain), recording compile time
and slope-timed throughput into FULLSTACK_BATCH_r05.json.

The round-4 sweep (scan-only) recorded a non-monotone anomaly
(B256 = 1,166 audio-s/s with a 105 s compile vs B1024 = 4,746 with 24 s)
with no explanation; this harness re-measures with per-point compile
timing so transient axon compile-service behaviour is visible in the
artifact instead of contaminating the sweep silently.

    python -u benchmarks/fullstack_batch.py [--backend fused,scan] [--batches 64,256,1024]
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
    ap.add_argument("--backends", default="fused,scan")
    ap.add_argument("--batches", default="64,256,1024")
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--out", default="FULLSTACK_BATCH_r05.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.runtime.full_stack import full_stack_process

    fs = 16000
    S = int(args.seconds * fs) // 256 * 256
    geom = ArrayGeometry.linear(4, 0.032, fs=fs)
    ang = (np.pi / 2, 0.0)
    rng = np.random.default_rng(0)

    results = {}
    try:
        with open(args.out) as f:
            results = json.load(f)
    except Exception:
        pass

    for backend in args.backends.split(","):
        dest = results.setdefault(backend, {})
        for B in (int(b) for b in args.batches.split(",")):
            key = f"B{B}"
            x = jnp.asarray(rng.standard_normal((B, 4, S)).astype(np.float32))

            fn = jax.jit(lambda xx: full_stack_process(
                xx, xx[..., 0, :], geom, ang, backend=backend)[0])

            def timed(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    y = fn(x)
                s = float(jax.device_get(jnp.sum(jnp.abs(y.ravel()[:8]))[None])[0])
                assert np.isfinite(s), s
                return time.perf_counter() - t0

            try:
                t0 = time.perf_counter()
                timed(1)
                compile_s = time.perf_counter() - t0
                timed(1)
                # slope over a wide span (tunnel jitter is tens of ms)
                lo, hi = timed(2), timed(10)
                per = (hi - lo) / 8
                v = B * args.seconds / per
                dest[key] = {
                    "audio_s_per_s": round(v, 1),
                    "compile_s": round(compile_s, 1),
                    "ms_per_iter": round(per * 1e3, 1),
                }
            except Exception as e:
                dest[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(backend, key, json.dumps(dest[key]), flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
