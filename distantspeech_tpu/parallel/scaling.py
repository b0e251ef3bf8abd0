"""Scaling harness: audio-seconds/s across mesh shapes (SURVEY §7.8).

Measures the sharded flagship pipeline at a list of ('dp', 'fb') mesh
shapes over however many devices exist — one real chip, a virtual
8-device CPU mesh, or a multi-host slice (initialise jax.distributed
before calling and the same code runs over DCN+ICI).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from distantspeech_tpu.array.geometry import ArrayGeometry
from distantspeech_tpu.beamform.enhance import EnhanceConfig
from distantspeech_tpu.parallel.mesh import make_mesh
from distantspeech_tpu.parallel.sharded import make_sharded_enhance
from distantspeech_tpu.runtime.profiling import slope_per_iter


def measure_scaling(
    mesh_shapes: Optional[List[Tuple[int, int]]] = None,
    batch_per_dp: int = 8,
    n_mics: int = 8,
    seconds: float = 4.0,
    fs: int = 16000,
    iters: int = 6,
) -> List[Dict]:
    """Run the flagship pipeline at each mesh shape; returns metric dicts."""
    n_dev = len(jax.devices())
    if mesh_shapes is None:
        mesh_shapes = [(1, 1)]
        if n_dev > 1:
            mesh_shapes += [(1, n_dev), (n_dev, 1)]
            if n_dev % 2 == 0:
                mesh_shapes.append((2, n_dev // 2))

    geom = ArrayGeometry.linear(n_mics, 0.032, fs=fs)
    S = int(fs * seconds) // 128 * 128
    results = []
    for (dp, fb) in mesh_shapes:
        if dp * fb > n_dev:
            continue
        mesh = make_mesh(dp, fb, devices=jax.devices()[: dp * fb])
        run = make_sharded_enhance(mesh, geom, (90.0, 0.0), EnhanceConfig())
        B = batch_per_dp * dp
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, n_mics, S)).astype(np.float32))

        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                y = run(x)
            np.asarray(jax.device_get(jnp.sum(jnp.abs(y), axis=-1)[:1]))
            return time.perf_counter() - t0

        timed(1)
        timed(1)
        n1 = max(1, iters // 3)
        per, _ = slope_per_iter(
            timed,
            pairs=((n1, iters), (n1 + 1, iters + 1), (n1 + 2, iters + 2)),
            min_per_iter=B * seconds / 1.0e6,
        )
        results.append(
            {
                "mesh": f"{dp}x{fb}",
                "devices": dp * fb,
                "batch": B,
                "audio_seconds_per_s": B * seconds / per,
            }
        )
    return results


if __name__ == "__main__":
    import json

    for r in measure_scaling():
        print(json.dumps(r))
