"""Tracing / profiling / observability (SURVEY §5).

The reference's observability is ``time.process_time()`` prints scattered in
demo mains; here it is a small structured harness:

- ``Timer``: wall-clock bracketing with audio-seconds/s accounting;
- ``benchmark``: compile-then-measure of any jitted fn with the
  forced-readback synchronisation the axon tunnel requires (plain
  ``block_until_ready`` returns early there — see
  .claude/skills/verify/SKILL.md);
- ``trace``: context manager around ``jax.profiler`` for on-device traces;
- ``stage_metrics``: per-stage metric dicts (SNR gain, gains, presence
  heatmaps) matching the reference's habit of returning debug taps.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class Timer:
    name: str = "stage"
    audio_seconds: float = 0.0
    elapsed: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0

    @property
    def realtime_factor(self) -> float:
        return self.audio_seconds / self.elapsed if self.elapsed else float("inf")


def benchmark(fn: Callable, *args, iters: int = 8, warmup: int = 2) -> Dict[str, float]:
    """Measure a jitted fn with slope timing + forcing readback.

    Returns {'per_call_s', 'calls_per_s'}.
    """
    for _ in range(warmup):
        out = fn(*args)
        _sync(out)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    n1, n2 = max(1, iters // 4), iters
    t1, t2 = run(n1), run(n2)
    per = max((t2 - t1) / (n2 - n1), 1e-9)
    return {"per_call_s": per, "calls_per_s": 1.0 / per}


def _sync(out: Any) -> None:
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace around a block; view with xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def stage_metrics(name: str, signal_in: np.ndarray, signal_out: np.ndarray, p: Optional[np.ndarray] = None) -> Dict:
    """Structured per-stage report: energies, crude SNR-gain proxy, SPP stats."""
    ein = float(np.mean(np.square(signal_in)))
    eout = float(np.mean(np.square(signal_out)))
    m: Dict[str, Any] = {
        "stage": name,
        "energy_in": ein,
        "energy_out": eout,
        "energy_ratio_db": 10.0 * np.log10(eout / ein) if ein > 0 else float("-inf"),
    }
    if p is not None:
        m["p_mean"] = float(np.mean(p))
        m["p_active_frac"] = float(np.mean(p > 0.5))
    return m
