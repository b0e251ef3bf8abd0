"""In-process A/B of the flagship fast paths on the real TPU.

Compares ``fused_enhance`` (XLA analysis matmuls + two Pallas calls) against
``fused_enhance_full`` (everything in one Pallas call) at the bench.py
flagship shape, with the same parity gate and slope timing.  Only in-process
A/Bs are trustworthy on the tunnelled chip (docs/performance.md).

Usage: python -u benchmarks/ab_fused.py [--quick] 2>&1 | tee /tmp/ab.log
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller pairs, no retries")
    ap.add_argument("--cpu", action="store_true", help="force CPU (semantics only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.array.steering import steering_vector
    from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_init, enhance_scan
    from distantspeech_tpu.ops.pallas_enhance import fused_enhance, fused_enhance_full
    from distantspeech_tpu.runtime.profiling import slope_per_iter
    from distantspeech_tpu.transform import analysis, synthesis

    fs = 16000
    n_mics = 8
    batch = 32
    seconds_per_utt = 4.0
    S = int(fs * seconds_per_utt) // 128 * 128

    geom = ArrayGeometry.linear(n_mics, 0.032, fs=fs)
    cfg = EnhanceConfig()
    angle = np.array([90.0, 0.0]) / 180.0 * np.pi
    steer = np.asarray(steering_vector(geom, angle, cfg.stft.n_fft), dtype=np.complex64)

    def to_zt(x):
        X = analysis(x, cfg.stft)
        return jnp.moveaxis(jnp.moveaxis(X, -3, -1), -3, 0)

    @jax.jit
    def scan_ref(x):
        Zt = to_zt(x)
        state = enhance_init(cfg, n_mics, batch_shape=(x.shape[0],), cdtype=jnp.complex64)
        _, Y_ref = enhance_scan(cfg, jnp.asarray(steer), state, Zt)
        return synthesis(jnp.moveaxis(Y_ref, 0, -2), cfg.stft)

    @jax.jit
    def gap(y_ref, y):
        scale = jnp.maximum(jnp.max(jnp.abs(y_ref)), 1e-20)
        return jnp.max(jnp.abs(y - y_ref)) / scale

    rng = np.random.default_rng(0)
    x_gate = jnp.asarray(rng.standard_normal((2, n_mics, fs)).astype(np.float32))

    variants = {
        "fused": jax.jit(lambda x: fused_enhance(x, steer, cfg)),
        "mega": jax.jit(lambda x: fused_enhance_full(x, steer, cfg)),
    }

    # ---- parity gates (compile at gate shape first; fail fast) -------------
    y_ref = scan_ref(x_gate)
    for name, fn in variants.items():
        t0 = time.perf_counter()
        y = fn(jnp.tile(x_gate, (4, 1, 1)))[:2]
        rel = float(jax.device_get(gap(y_ref, y)))
        print(f"[{name}] gate rel={rel:.2e} (compile+run {time.perf_counter()-t0:.1f}s)", file=sys.stderr)
        if not (np.isfinite(rel) and rel < 1e-3):
            raise RuntimeError(f"{name} parity gate FAILED: {rel:.3e}")

    # ---- timed A/B at flagship shape ----------------------------------------
    x = jnp.asarray(rng.standard_normal((batch, n_mics, S)).astype(np.float32))
    audio_seconds = batch * seconds_per_utt
    results = {}
    pairs = ((1, 4), (2, 5), (1, 5)) if args.quick else ((2, 8), (3, 11), (4, 14))
    for name, fn in variants.items():
        def timed(iters, fn=fn):
            t0 = time.perf_counter()
            xi = x
            for _ in range(iters):
                y = fn(xi)
                xi = x + 0.0 * y[:, None, :1]
            s = float(jax.device_get(jnp.sum(y[:, :16])))
            assert np.isfinite(s), s
            return time.perf_counter() - t0

        timed(1)
        timed(1)
        per_iter, retries = slope_per_iter(
            timed, pairs=pairs, retries=0 if args.quick else 2,
            min_per_iter=audio_seconds / 1e6,
            log=lambda m: print(m, file=sys.stderr),
        )
        results[name] = {
            "ms_per_iter": round(per_iter * 1e3, 3),
            "audio_s_per_s": round(audio_seconds / per_iter, 1),
            "retries": retries,
        }
        print(f"[{name}] {results[name]}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
