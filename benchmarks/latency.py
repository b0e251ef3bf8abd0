"""Streaming chunk-latency artifact for the realtime pipeline zoo.

Drives every STREAM_FACTORIES pipeline chunk by chunk (the reference's
realtime app loop, realtime_processing.py:70-136, which drives *any*
EnhancementMethod, :78-84) and writes the machine-readable latency report
to LATENCY.json at the repo root — the regression guard for the
64 ms-per-1024-sample overflow contract (realtime_processing.py:126-127).

The flagship ("enhance") report stays at the top level for artifact
compatibility; every pipeline (flagship included) also appears under
``pipelines``.

    python -u benchmarks/latency.py [--cpu] [--chunks N] [--out PATH] \
        [--pipelines enhance,gsc,...]
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
    from distantspeech_tpu.runtime.streaming import STREAM_FACTORIES, wav_chunks

    fs, M, chunk = 16000, args.mics, args.chunk
    geom = ArrayGeometry.linear(M, 0.032, fs=fs)
    names = args.pipelines.split(",") if args.pipelines else sorted(STREAM_FACTORIES)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((M, chunk * args.chunks)) * 0.1).astype(np.float32)

    reports = {}
    for name in names:
        # full_stack chunk convention: rows 0..M-2 mics + last row far-end
        g = geom if name != "full_stack" else ArrayGeometry.linear(M - 1, 0.032, fs=fs)
        proc = STREAM_FACTORIES[name](g, (90.0, 0.0), chunk_size=chunk, fs=fs)
        out = proc.run(wav_chunks(x, chunk))
        assert out is not None and np.isfinite(out).all(), f"non-finite {name} streaming output"
        rep = proc.latency_report(skip_warmup=2)
        if rep["p50_ms"] is None or rep["p50_ms"] <= 0:
            raise RuntimeError(f"implausible latency report for {name}: {rep}")
        reports[name] = rep
        print(f"[{name}] p50={rep['p50_ms']}ms p95={rep['p95_ms']}ms "
              f"overflows={rep['overflows']} rt_factor={rep['realtime_factor']}", file=sys.stderr)

    # measured transport floor: an IDENTITY step driven through the same
    # loop.  If the pipelines' p50s sit at this number, per-chunk latency is
    # host<->device-transport-bound and a faster per-chunk kernel cannot
    # reduce it (the round-4 verdict asked for fused streaming steps; this
    # measurement is the decision evidence).
    import jax.numpy as jnp

    from distantspeech_tpu.runtime.streaming import StreamingProcessor

    ident = StreamingProcessor(
        lambda s, c: (s, jnp.mean(c, axis=0)), jnp.zeros(()), chunk_size=chunk, fs=fs)
    assert ident.run(wav_chunks(x, chunk)) is not None
    reports["_identity_floor"] = ident.latency_report(skip_warmup=2)
    print(f"[_identity_floor] p50={reports['_identity_floor']['p50_ms']}ms", file=sys.stderr)

    top = dict(reports.get("enhance", reports[names[0]]))
    top["platform"] = jax.devices()[0].platform
    top["n_mics"] = M
    top["note"] = (
        "per-chunk latency INCLUDES host<->device transport; over the "
        "axon tunnel that is a ~30 ms round-trip floor shared by every "
        "pipeline (device compute is the 0-4 ms spread between them; "
        "cf. PIPELINES throughput, where transfers amortise)"
    )
    top["pipelines"] = reports
    with open(args.out, "w") as f:
        json.dump(top, f, indent=1)
    print(json.dumps(top))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--chunks", type=int, default=40)
    p.add_argument("--mics", type=int, default=8)
    p.add_argument("--pipelines", default=None, help="comma list (default: all)")
    p.add_argument("--out", default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "LATENCY.json"))
    main(p.parse_args())
