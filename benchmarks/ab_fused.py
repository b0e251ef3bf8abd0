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
    ap.add_argument("--parts", action="store_true",
                    help="profile mode: time mega_bf16x3 sub-configurations instead")
    ap.add_argument("--batch-sweep", action="store_true",
                    help="time mega_bf16x3 at B=32/64/128 (per-chip throughput vs batch)")
    ap.add_argument("--rank1", action="store_true",
                    help="A/B the Bennett rank-1 factor-update MVDR (inv_mode='rank1') "
                         "against the per-frame-LDL kernel at the flagship shape, with "
                         "on-device gates (rank1 vs ldl: tight guard-off, decision-flip "
                         "tolerance on the benched guarded config)")
    ap.add_argument("--fast-gate", action="store_true",
                    help="gate variants against fused_enhance instead of the scan "
                         "reference (whose B=2 compile takes ~7 min on axon); fused "
                         "itself is scan-gated by bench.py every round")
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
        "mega_bf16x3": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3")),
    }
    if args.parts:
        variants = {
            "mega_bf16x3": variants["mega_bf16x3"],
            "b3_sub16": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=16)),
            "b3_sub32": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=32)),
            "b3_no_nyq": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", _skip_nyquist=True)),
        }
    batch_sizes = {name: batch for name in variants}
    if args.rank1:
        from distantspeech_tpu.beamform.mvdr import MvdrConfig

        mv = cfg.mvdr
        cfg_nog = EnhanceConfig(
            mvdr=MvdrConfig(**{**mv.__dict__, "vad_guard": False}),
            alpha_xi=cfg.alpha_xi, gmin=cfg.gmin,
        )
        variants = {
            "b3_B64_s32_ldl": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=32)),
            "b3_B64_s32_rank1": jax.jit(
                lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=32, inv_mode="rank1")),
        }
        batch_sizes = {name: 64 for name in variants}
        # on-device gates: rank1 vs the ldl kernel (its own scan gate is
        # bench.py's) — tight with the guard's decision boundary off, then
        # the exact benched config at decision-flip tolerance
        def _gap_fn(c):
            @jax.jit
            def g(x32):
                a = fused_enhance_full(x32, steer, c, mxu="bf16x3", sub=32)
                b = fused_enhance_full(x32, steer, c, mxu="bf16x3", sub=32, inv_mode="rank1")
                scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-20)
                return jnp.max(jnp.abs(b - a)) / scale
            return g
        x32 = jnp.asarray(rng.standard_normal((32, n_mics, fs)).astype(np.float32))
        for c, tol, label in ((cfg_nog, 1e-3, "tight, guard off"), (cfg, 2e-2, "benched config")):
            rel = float(jax.device_get(_gap_fn(c)(x32)))
            print(f"[rank1 gate] {label}: rel={rel:.2e} (tol {tol:g})", file=sys.stderr)
            if not (np.isfinite(rel) and rel < tol):
                raise RuntimeError(f"rank1 on-device gate FAILED ({label}): {rel:.3e}")
    if args.batch_sweep:
        variants = {
            "b3_B32_s32": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=32)),
            "b3_B64": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3")),
            "b3_B64_s32": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=32)),
            "b3_B64_s64": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=64)),
            "b3_B128_s32": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=32)),
            "b3_B128_s64": jax.jit(lambda x: fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=64)),
        }
        batch_sizes = {"b3_B32_s32": 32, "b3_B64": 64, "b3_B64_s32": 64,
                       "b3_B64_s64": 64, "b3_B128_s32": 128, "b3_B128_s64": 128}

    # ---- parity gates (compile at gate shape first; fail fast) -------------
    if args.parts or args.batch_sweep or args.rank1:
        gate_names = []  # parts diverge by design; --rank1 runs its own gates above
        y_ref = None
    elif args.fast_gate:
        y_ref = variants["fused"](jnp.tile(x_gate, (4, 1, 1)))[:2]
        gate_names = [n for n in variants if n != "fused"]
    else:
        y_ref = scan_ref(x_gate)
        gate_names = list(variants)
    for name in gate_names:
        t0 = time.perf_counter()
        y = variants[name](jnp.tile(x_gate, (4, 1, 1)))[:2]
        rel = float(jax.device_get(gap(y_ref, y)))
        print(f"[{name}] gate rel={rel:.2e} (compile+run {time.perf_counter()-t0:.1f}s)", file=sys.stderr)
        if not (np.isfinite(rel) and rel < 1e-3):
            raise RuntimeError(f"{name} parity gate FAILED: {rel:.3e}")

    # ---- timed A/B at flagship shape ----------------------------------------
    # Tunnel throughput drifts on a multi-minute scale (measured: the same
    # variant 2.7 vs 7.6 ms/iter in back-to-back runs), so variants are
    # INTERLEAVED: each round measures one slope per variant, and the
    # reported number is the per-variant median (and min) across rounds.
    xs = {
        name: jnp.asarray(rng.standard_normal((batch_sizes[name], n_mics, S)).astype(np.float32))
        for name in variants
    }
    audio_s = {name: batch_sizes[name] * seconds_per_utt for name in variants}
    rounds = 2 if args.quick else 4

    def make_timed(fn, x):
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

    timers = {name: make_timed(fn, xs[name]) for name, fn in variants.items()}
    for t in timers.values():  # compile + transfer-path warmup
        t(1)
        t(1)

    # span must dwarf the fetch/dispatch jitter (tens of ms on the tunnel):
    # 100 chained iters ~ 250 ms of device work per slope
    LO, HI = (4, 24) if args.quick else (10, 110)
    slopes = {name: [] for name in variants}
    for r in range(rounds):
        for name, t in timers.items():
            lo, hi = t(LO), t(HI)
            slopes[name].append((hi - lo) / (HI - LO))
            print(f"round {r} [{name}] {slopes[name][-1]*1e3:.3f} ms/iter", file=sys.stderr)

    results = {}
    for name, ss in slopes.items():
        med, best = float(np.median(ss)), float(np.min(ss))
        if not (np.isfinite(med) and med > audio_s[name] / 1e6):
            raise RuntimeError(f"implausible slope for {name}: {ss}")
        results[name] = {
            "batch": batch_sizes[name],
            "ms_per_iter_median": round(med * 1e3, 3),
            "ms_per_iter_min": round(best * 1e3, 3),
            "audio_s_per_s_median": round(audio_s[name] / med, 1),
            "audio_s_per_s_best": round(audio_s[name] / best, 1),
        }
        print(f"[{name}] {results[name]}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
