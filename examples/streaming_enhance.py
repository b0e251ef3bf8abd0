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
    import jax.numpy as jnp
    from functools import partial

    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.array.steering import steering_vector
    from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_init, enhance_step
    from distantspeech_tpu.runtime.streaming import StreamingProcessor, wav_chunks
    from distantspeech_tpu.transform.stft import istft_stream, stft_stream

    fs, C, chunk = 16000, 4, 1024
    cfg = EnhanceConfig()
    geom = ArrayGeometry.linear(C, 0.04, fs=fs)
    steer = np.asarray(steering_vector(geom, (np.pi / 2, 0.0), cfg.stft.n_fft), dtype=np.complex64)

    def step(state, x_chunk):
        (cin, cout, enh) = state
        cin, Z = stft_stream(cin, x_chunk, cfg.stft)  # [C, J, F]
        Zt = jnp.moveaxis(Z, -2, 0).swapaxes(-1, -2)  # [J, F, C]
        enh, Y = jax.lax.scan(lambda s, z: enhance_step(cfg, steer, s, z), enh, Zt)
        cout, y = istft_stream(cout, jnp.moveaxis(Y, 0, -2), cfg.stft)
        return (cin, cout, enh), y

    # build the carry under jit: eager complex-zero creation (enhance_init's
    # covariances) is UNIMPLEMENTED on remote-attached TPUs, and the error
    # surfaces asynchronously at the first device->host fetch
    init = jax.jit(lambda: (
        jnp.zeros((C, cfg.stft.overlap), jnp.float32),
        jnp.zeros(cfg.stft.overlap, jnp.float32),
        enhance_init(cfg, C),
    ))()
    proc = StreamingProcessor(step, init, chunk_size=chunk, fs=fs)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((C, fs * 4)).astype(np.float32) * 0.1
    out = proc.run(wav_chunks(x, chunk))
    print(f"chunks: {proc.chunks}, overflows: {proc.overflows}, out: {out.shape}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    main(p.parse_args())
