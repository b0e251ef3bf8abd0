"""Throughput of every offline pipeline on the attached device.

Prints one JSON line per pipeline: audio-seconds of multichannel input
processed per wall-clock second (slope-timed like bench.py).

    python benchmarks/pipelines.py [--cpu] [--batch N] [--seconds S]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _throughput(f, x, audio_seconds, ceiling=1.0e6, pairs=((1, 4), (2, 6), (2, 8))):
    import jax
    import jax.numpy as jnp

    from distantspeech_tpu.runtime.profiling import slope_per_iter

    def timed(n):
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(x)
        leaf = jax.tree_util.tree_leaves(y)[0]
        s = float(jax.device_get(jnp.sum(jnp.abs(leaf.ravel()[:8]))[None])[0])
        assert np.isfinite(s), s
        return time.perf_counter() - t0

    timed(1)
    timed(1)
    # robust median slope: raises instead of reporting garbage (see profiling)
    per, _ = slope_per_iter(timed, pairs=pairs, min_per_iter=audio_seconds / ceiling)
    return audio_seconds / per


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--only", default=None,
                   help="comma-separated pipeline-name substrings to run (each "
                        "pipeline compiles for minutes over the axon tunnel — "
                        "select what you need)")
    args = p.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.beamform import (
        FdGscConfig, FixedBeamformerConfig, GscConfig, PmwfConfig, TdGscConfig,
        fdgsc_process, fixed_beamformer_weights, fixed_process, gsc_process,
        mvdr_process, pmwf_process, tdgsc_process,
    )
    from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_process
    from distantspeech_tpu.coherence.enhance import BinauralConfig, binaural_process
    from distantspeech_tpu.derev import WpeConfig, wpe_process
    from distantspeech_tpu.kws import DualMicKwsConfig, kws_process

    fs = 16000
    B, S = args.batch, int(args.seconds * fs) // 128 * 128
    rng = np.random.default_rng(0)

    def mk_x(M):
        return jnp.asarray(rng.standard_normal((B, M, S)).astype(np.float32))

    geom8 = ArrayGeometry.linear(8, 0.032, fs=fs)
    geom4 = ArrayGeometry.linear(4, 0.032, fs=fs)
    geom2 = ArrayGeometry.linear(2, 0.032, fs=fs)
    fix_cfg = FixedBeamformerConfig(weight_type="SD")
    # keep W as numpy: eager complex device transfer is UNIMPLEMENTED over
    # the axon tunnel; as a jit closure it embeds as a compiled constant
    W = fixed_beamformer_weights(geom4, (90.0, 0.0), fix_cfg)
    audio = B * S / fs
    ang = (np.pi / 2, 0.0)

    cases = {
        "fixed_sd_4mic": (lambda x: fixed_process(x, jnp.asarray(W), fix_cfg.stft), mk_x(4)),
        "mvdr_8mic": (lambda x: mvdr_process(x, geom8, (90.0, 0.0)), mk_x(8)),
        "enhance_scan_8mic": (lambda x: enhance_process(x, geom8, (90.0, 0.0)), mk_x(8)),
        "pmwf_4mic": (lambda x: pmwf_process(x, geom4, PmwfConfig(n_mics=4)), mk_x(4)),
        # normalize_aic: white-noise input diverges the reference's
        # unnormalised canceller (faithfully reproduced by the default)
        "gsc_4mic": (lambda x: gsc_process(x, geom4, ang, GscConfig(n_mics=4, normalize_aic=True, spp_rel_diag=1e-5)), mk_x(4)),
        "tdgsc_4mic": (lambda x: tdgsc_process(x, geom4, ang, TdGscConfig(n_mics=4))[0], mk_x(4)),
        "fdgsc_4mic": (lambda x: fdgsc_process(x, geom4, ang, FdGscConfig(n_mics=4))[0], mk_x(4)),
        "wpe_2mic": (lambda x: wpe_process(x, WpeConfig(n_channels=2)), mk_x(2)),
        "kws_2mic": (lambda x: kws_process(x, DualMicKwsConfig()), mk_x(2)),
        "binaural_2mic": (lambda x: binaural_process(x, geom2, BinauralConfig())[0], mk_x(2)),
    }
    if not args.cpu:
        cases["enhance_pallas_8mic"] = (
            lambda x: enhance_process(x, geom8, (90.0, 0.0), backend="pallas"), mk_x(8),
        )
        if B % 8 == 0:
            cases["enhance_fused_8mic"] = (
                lambda x: enhance_process(x, geom8, (90.0, 0.0), backend="fused"), mk_x(8),
            )

    if args.only:
        keys = [k.strip() for k in args.only.split(",")]
        cases = {n: c for n, c in cases.items() if any(k in n for k in keys)}

    for name, (fn, x) in cases.items():
        try:
            # near-instant pipelines (fixed BF) need more chained iterations
            # for the slope to rise above the tunnel's readback jitter
            pairs = ((4, 16), (6, 22), (8, 28)) if name.startswith("fixed") else ((1, 4), (2, 6), (2, 8))
            v = _throughput(jax.jit(fn), x, audio, pairs=pairs)
            print(json.dumps({"pipeline": name, "audio_s_per_s": round(v, 1), "batch": B}))
        except Exception as e:  # keep going if one pipeline trips an env issue
            print(json.dumps({"pipeline": name, "error": f"{type(e).__name__}"}))


if __name__ == "__main__":
    main()
