"""Streaming chunk-latency artifact for the flagship realtime path.

Drives the MVDR+OM-LSA streaming step chunk by chunk (the reference's
realtime app loop, realtime_processing.py:70-136) and writes the
machine-readable latency report to LATENCY.json at the repo root —
the regression guard for the 64 ms-per-1024-sample overflow contract
(realtime_processing.py:126-127).

    python benchmarks/latency.py [--cpu] [--chunks N] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.runtime.streaming import make_enhance_stream, wav_chunks

    fs, M, chunk = 16000, args.mics, args.chunk
    geom = ArrayGeometry.linear(M, 0.032, fs=fs)
    proc = make_enhance_stream(geom, (90.0, 0.0), chunk_size=chunk, fs=fs)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((M, chunk * args.chunks)) * 0.1).astype(np.float32)
    out = proc.run(wav_chunks(x, chunk))
    assert out is not None and np.isfinite(out).all(), "non-finite streaming output"

    report = proc.latency_report(skip_warmup=2)
    report["platform"] = jax.devices()[0].platform
    report["n_mics"] = M
    if report["p50_ms"] is None or report["p50_ms"] <= 0:
        raise RuntimeError(f"implausible latency report: {report}")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--chunks", type=int, default=40)
    p.add_argument("--mics", type=int, default=8)
    p.add_argument("--out", default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "LATENCY.json"))
    main(p.parse_args())
