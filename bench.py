"""Flagship benchmark: 8-mic adaptive MVDR + OM-LSA postfilter throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric is audio-seconds of multichannel input processed per wall-clock
second on one chip; the reference NumPy implementation runs at ~1x realtime
on CPU by its own overflow check (realtime_processing.py:126-127), so
``vs_baseline`` is the same number (target from BASELINE.json: >= 500).

Trustworthiness (round-2 hardening — the round-1 artifact printed a
clamped nonsense value when a flaky readback made the two-point slope
negative):

1. PARITY GATE first: the fused Pallas kernel is checked against the pure
   ``enhance_scan`` path on-device on a 1-s input (rel. error < 1e-3)
   before anything is timed — a fast wrong answer fails the run.
2. ROBUST TIMING: median slope over >= 3 iteration pairs via
   ``runtime.profiling.slope_per_iter``; any non-positive slope or an
   implied throughput above the 1e6 audio-s/s sanity ceiling retries and
   then RAISES instead of printing.  Retries are reported on stderr.

Designed for the axon-tunnel TPU: minimal device->host fetches, complex
constants created inside jit only (see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time

import numpy as np

SANITY_CEILING = 1.0e6  # audio-s/s/chip; far above the VPU roofline for this op mix


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.array.steering import steering_vector
    from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_init, enhance_scan
    from distantspeech_tpu.ops.pallas_enhance import fused_enhance_full
    from distantspeech_tpu.runtime.profiling import slope_per_iter
    from distantspeech_tpu.transform import analysis, synthesis

    fs = 16000
    n_mics = 8
    batch = 64  # B=64 x sub=32 measured best-and-stable (docs/performance.md r3 sweep)
    seconds_per_utt = 4.0
    S = int(fs * seconds_per_utt) // 128 * 128

    geom = ArrayGeometry.linear(n_mics, 0.032, fs=fs)
    cfg = EnhanceConfig()
    angle = np.array([90.0, 0.0]) / 180.0 * np.pi
    steer = np.asarray(steering_vector(geom, angle, cfg.stft.n_fft), dtype=np.complex64)

    def to_zt(x):
        X = analysis(x, cfg.stft)
        return jnp.moveaxis(jnp.moveaxis(X, -3, -1), -3, 0)  # [T, B, F, M]

    # ---- parity gates: compiled fused kernel vs scan reference, on device --
    # the scan reference compiles in seconds at B=2 but takes ~6 min at B=8
    # on the axon backend, so gate at B=2 and tile the fused input up to its
    # B%8==0 requirement (batch rows are independent in both paths).
    #
    # TWO gates because the default vad_guard compares the RAW S/Smin ratio
    # against a hard threshold every (frame, bin): any sub-ulp arithmetic
    # difference between the XLA scan and the Mosaic kernel (and especially
    # the ~1e-5 bf16x3 analysis perturbation) can flip a handful of Rvv
    # hold/update decisions, after which the two runs legitimately diverge
    # at the ~1e-3 level — bounded decision noise, not numeric error.
    # Gate 1 therefore checks the full numerics TIGHT with the guard's
    # decision boundary disabled; gate 2 checks the exact benched config at
    # a tolerance above the decision-flip level.
    from distantspeech_tpu.beamform.mvdr import MvdrConfig

    mv = cfg.mvdr
    cfg_nog = EnhanceConfig(
        mvdr=MvdrConfig(**{**mv.__dict__, "vad_guard": False}),
        alpha_xi=cfg.alpha_xi, gmin=cfg.gmin,
    )

    def scan_ref(cfgx):
        @jax.jit
        def f(x):
            Zt = to_zt(x)
            state = enhance_init(cfgx, n_mics, batch_shape=(x.shape[0],), cdtype=jnp.complex64)
            _, Y_ref = enhance_scan(cfgx, jnp.asarray(steer), state, Zt)
            return synthesis(jnp.moveaxis(Y_ref, 0, -2), cfg.stft)
        return f

    def fused_gate(cfgx):
        @jax.jit
        def f(x2):
            y = fused_enhance_full(
                jnp.tile(x2, (16, 1, 1)), steer, cfgx, mxu="bf16x3", sub=32, inv_mode="rank1"
            )
            return y[:2]
        return f

    @jax.jit
    def gap(y_ref, y_fused):
        scale = jnp.maximum(jnp.max(jnp.abs(y_ref)), 1e-20)
        return jnp.max(jnp.abs(y_fused - y_ref)) / scale

    rng = np.random.default_rng(0)
    x_gate = jnp.asarray(rng.standard_normal((2, n_mics, fs)).astype(np.float32))
    rel = float(jax.device_get(gap(scan_ref(cfg_nog)(x_gate), fused_gate(cfg_nog)(x_gate))))
    if not (np.isfinite(rel) and rel < 1e-3):
        raise RuntimeError(f"parity gate FAILED: fused vs scan rel error {rel:.3e} (need < 1e-3)")
    print(f"parity gate (guard off, tight): rel error {rel:.2e} — ok", file=sys.stderr)

    rel2 = float(jax.device_get(gap(scan_ref(cfg)(x_gate), fused_gate(cfg)(x_gate))))
    if not (np.isfinite(rel2) and rel2 < 2e-2):
        raise RuntimeError(f"parity gate FAILED: benched config rel error {rel2:.3e} (need < 2e-2)")
    print(f"parity gate (benched config, decision-flip tolerance): rel error {rel2:.2e} — ok", file=sys.stderr)

    # ---- timed pipeline -----------------------------------------------------
    @jax.jit
    def forward(x):
        # mega-fused fast path: framing, windowed DFT, MCRA, MVDR, OM-LSA,
        # inverse DFT and overlap-add in ONE Pallas call (+ the tiny Nyquist
        # companion), analysis/synthesis dots in 3-pass bf16 (~1e-5 rel —
        # the parity gate above bounds the end-to-end error at 1e-3);
        # 32 batch rows per vreg tile (4 vregs/op amortise instruction issue);
        # MVDR inverse via Bennett rank-1 LDL factor updates after a 64-frame
        # exact-LDL warmup (inv_mode='rank1': ~1.35x fewer VPU ops per steady
        # frame; the r5 lever on the VPU instruction-issue roofline) — the
        # gates above compare THIS code path against the reference-exact scan
        return fused_enhance_full(x, steer, cfg, mxu="bf16x3", sub=32, inv_mode="rank1")

    x = jnp.asarray(rng.standard_normal((batch, n_mics, S)).astype(np.float32))

    def timed(iters):
        """Dispatch `iters` chained steps and force completion with a scalar
        fetch — on the axon tunnel block_until_ready returns early, so the
        only reliable sync is a device->host readback.  The chain (y feeds
        the next input's scale) prevents reordering/elision."""
        t0 = time.perf_counter()
        xi = x
        for _ in range(iters):
            y = forward(xi)
            xi = x + 0.0 * y[:, None, :1]
        s = float(jax.device_get(jnp.sum(y[:, :16])))
        assert np.isfinite(s), s
        return time.perf_counter() - t0

    # compile + warm up the transfer path (first fetch can take ~1 min; keep
    # the number of fetches low — the tunnel readback is the fragile part)
    timed(1)
    timed(1)

    audio_seconds = batch * seconds_per_utt
    # wide spans: the tunnel's dispatch/fetch jitter is tens of ms, so each
    # slope must cover ~100 iterations (~250 ms of device work) to keep the
    # noise under a few percent (measured round 3: 6-iter spans varied 2x)
    per_iter, retries = slope_per_iter(
        timed,
        pairs=((10, 110), (15, 115), (20, 120)),
        retries=2,
        min_per_iter=audio_seconds / SANITY_CEILING,
        log=lambda m: print(m, file=sys.stderr),
    )
    print(f"timing retries: {retries}", file=sys.stderr)

    value = audio_seconds / per_iter
    if not (np.isfinite(value) and 0.0 < value < SANITY_CEILING):
        raise RuntimeError(f"implausible throughput {value:.3g} audio-s/s (ceiling {SANITY_CEILING:.0e})")
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_8mic_mvdr_omlsa",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
