"""Which component sets the TDGSC-family ~35 audio-s/s floor?

Times each piece of tdgsc_process in isolation on the attached device:
whole-utterance preprocessing (dc-notch + alignment FIR), and 500-frame
scans of stft_stream, mcra_step, and flms_step individually, vs the full
pipeline.  Interleaved slope timing (docs/performance.md "Benchmarking").

    python -u benchmarks/profile_tdgsc.py [--cpu] [--batch N]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distantspeech_tpu.adaptive.feature import dc_notch, dc_notch_init
    from distantspeech_tpu.adaptive.flms import FlmsConfig, flms_init, flms_step
    from distantspeech_tpu.array.alignment import time_alignment_filters
    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.beamform.tdgsc import TdGscConfig, tdgsc_process
    from distantspeech_tpu.noise.mcra import mcra_init, mcra_step
    from distantspeech_tpu.ops.fir import fir_filter_offline
    from distantspeech_tpu.transform.stft import stft_stream

    fs = 16000
    B, M = args.batch, 4
    S = int(args.seconds * fs) // 128 * 128
    L = 256
    T = S // L
    cfg = TdGscConfig(n_mics=M)
    geom = ArrayGeometry.linear(M, 0.032, fs=fs)
    ang = (np.pi / 2, 0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, M, S)).astype(np.float32))

    coeffs_np = np.asarray(time_alignment_filters(geom, ang), dtype=np.float32)

    def prep(xx):
        _, xn = dc_notch(dc_notch_init(xx.shape[:-1], dtype=xx.dtype), xx, radius=0.98)
        return fir_filter_offline(xn, jnp.asarray(coeffs_np, dtype=xx.dtype))

    def scan_stft(xx):
        fbf = jnp.mean(xx, axis=-2)
        blocks = jnp.moveaxis(fbf[..., : T * L].reshape(B, T, L), -2, 0)
        carry0 = jnp.zeros((B, L), dtype=xx.dtype)

        def body(c, blk):
            c2, D = stft_stream(c, blk, cfg.stft)
            return c2, jnp.abs(D[..., 0, :]) ** 2

        _, P = jax.lax.scan(body, carry0, blocks)
        return P

    def scan_mcra(xx):
        P = scan_stft(xx)

        def body(s, p):
            s2, (_, pp) = mcra_step(cfg.mcra, s, p)
            return s2, pp

        st = mcra_init(cfg.mcra, (B,), dtype=xx.dtype)
        _, out = jax.lax.scan(body, st, P)
        return out

    def scan_flms(xx):
        fbf = jnp.mean(xx, axis=-2)
        bm = xx[..., :-1, :] - xx[..., 1:, :]
        fb = jnp.moveaxis(fbf[..., : T * L].reshape(B, T, L), -2, 0)
        bb = jnp.moveaxis(bm[..., : T * L].reshape(B, M - 1, T, L), -2, 0)

        def body(s, blk):
            s2, (out, _) = flms_step(cfg.aic, s, blk[1], blk[0], fir_truncate=cfg.fir_truncate)
            return s2, out

        st = flms_init(cfg.aic, (B,), dtype=xx.dtype)
        _, out = jax.lax.scan(body, st, (fb, bb))
        return out

    def dc_only(xx):
        _, xn = dc_notch(dc_notch_init(xx.shape[:-1], dtype=xx.dtype), xx, radius=0.98)
        return xn

    def fir_only(xx):
        return fir_filter_offline(xx, jnp.asarray(coeffs_np, dtype=xx.dtype))

    variants = {
        "dc_only": jax.jit(dc_only),
        "fir_only": jax.jit(fir_only),
        "prep_only": jax.jit(prep),
        "stft_scan": jax.jit(scan_stft),
        "stft+mcra": jax.jit(scan_mcra),
        "flms_scan": jax.jit(scan_flms),
        "full_tdgsc": jax.jit(lambda xx: tdgsc_process(xx, geom, ang, cfg)[0]),
    }

    def make_timed(fn):
        def timed(iters):
            t0 = time.perf_counter()
            xi = x
            for _ in range(iters):
                y = fn(xi)
                xi = x + 0.0 * y.reshape(B, -1)[:, None, :1]
            s = float(jax.device_get(jnp.sum(jnp.abs(y.reshape(B, -1)[:, :8]))))
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

    LO, HI = 2, 12
    slopes = {name: [] for name in variants}
    for r in range(args.rounds):
        for name, t in timers.items():
            lo, hi = t(LO), t(HI)
            slopes[name].append((hi - lo) / (HI - LO))
            print(f"round {r} [{name}] {slopes[name][-1]*1e3:.2f} ms/iter", file=sys.stderr)

    out = {name: round(float(np.median(ss)) * 1e3, 2) for name, ss in slopes.items()}
    print(json.dumps({"ms_per_iter_median": out, "batch": B, "frames": T}))


if __name__ == "__main__":
    main()
