"""Streaming (chunked) enhancement demo — the realtime_processing path.

Drives the flagship MVDR+OM-LSA step chunk by chunk through the
StreamingProcessor (host ring buffer -> jitted step), printing the
realtime factor and overflow count.

    python examples/streaming_enhance.py [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.runtime.streaming import make_enhance_stream, wav_chunks

    fs, C, chunk = 16000, 4, 1024
    geom = ArrayGeometry.linear(C, 0.04, fs=fs)
    proc = make_enhance_stream(geom, (90.0, 0.0), chunk_size=chunk, fs=fs)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((C, fs * 4)).astype(np.float32) * 0.1
    out = proc.run(wav_chunks(x, chunk))
    print(f"chunks: {proc.chunks}, overflows: {proc.overflows}, out: {out.shape}")
    print(proc.latency_report())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    main(p.parse_args())
