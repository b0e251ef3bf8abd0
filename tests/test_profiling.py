"""The timing harness must be unfalsifiable: a flaky measurement retries
and then raises — it can never silently return a clamped/implausible
per-iteration cost (the round-1 BENCH artifact printed audio/1e-9 when the
two-point slope went negative on a flaky readback)."""

import numpy as np
import pytest

from distantspeech_tpu.runtime.profiling import TimingError, benchmark, slope_per_iter


def test_slope_recovers_true_cost():
    per, retries = slope_per_iter(lambda n: 0.5 + 0.01 * n)
    assert retries == 0
    np.testing.assert_allclose(per, 0.01, rtol=1e-9)


def test_negative_slope_raises_not_clamps():
    # a run() whose time DECREASES with n (the round-1 failure mode)
    with pytest.raises(TimingError):
        slope_per_iter(lambda n: 1.0 - 0.01 * n, retries=1)


def test_implausibly_fast_raises():
    # positive slope but above the physical ceiling -> refuse
    with pytest.raises(TimingError):
        slope_per_iter(lambda n: 0.5 + 1e-12 * n, retries=1, min_per_iter=1e-6)


def test_one_flaky_attempt_then_recovers():
    calls = {"i": 0}

    def run(n):
        calls["i"] += 1
        if calls["i"] <= 2:  # first pair of the first attempt is garbage
            return 1.0 - 0.5 * n
        return 0.2 + 0.02 * n

    per, retries = slope_per_iter(run, retries=2)
    assert retries == 1
    np.testing.assert_allclose(per, 0.02, rtol=1e-9)


def test_min_pairs_enforced():
    with pytest.raises(ValueError, match="3 iteration pairs"):
        slope_per_iter(lambda n: 0.01 * n, pairs=((1, 2), (2, 3)))


def test_benchmark_runs_on_real_fn():
    import jax
    import jax.numpy as jnp

    # per-call work must dwarf timer noise or the robust slope legitimately
    # rejects the measurement under parallel-suite CPU contention (observed
    # flake with a 64-element reduction)
    f = jax.jit(lambda a: jnp.sum(a @ a))
    out = benchmark(f, jnp.ones((512, 512)), iters=4)
    assert out["per_call_s"] > 0 and np.isfinite(out["calls_per_s"])
