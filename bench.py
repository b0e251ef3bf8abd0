"""Flagship benchmark: 8-mic adaptive MVDR + OM-LSA postfilter throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric is audio-seconds of multichannel input processed per wall-clock
second on one chip; the reference NumPy implementation runs at ~1x realtime
on CPU by its own overflow check (realtime_processing.py:126-127), so
``vs_baseline`` is the same number (target from BASELINE.json: >= 500).

Designed for the axon-tunnel TPU: no device->host data fetches — only
``block_until_ready`` timing (see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from distantspeech_tpu.array.geometry import ArrayGeometry
    from distantspeech_tpu.array.steering import steering_vector
    from distantspeech_tpu.beamform.enhance import EnhanceConfig, enhance_scan_pallas
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

    @jax.jit
    def forward(x):
        X = analysis(x, cfg.stft)
        Zt = jnp.moveaxis(jnp.moveaxis(X, -3, -1), -3, 0)
        # fused sublane-tiled Pallas MVDR kernel (2.7x over the lax.scan path)
        Y = enhance_scan_pallas(cfg, jnp.asarray(steer), Zt)
        return synthesis(jnp.moveaxis(Y, 0, -2), cfg.stft)

    rng = np.random.default_rng(0)
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

    n1, n2 = 2, 14
    t1 = timed(n1)
    t2 = timed(n2)
    per_iter = max((t2 - t1) / (n2 - n1), 1e-9)

    audio_seconds = batch * seconds_per_utt
    value = audio_seconds / per_iter
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
