"""Test environment: CPU backend with 8 virtual devices (the JAX-native
"fake cluster" for multi-chip sharding tests) and float64 enabled so parity
tests against the float64 NumPy reference are not precision-limited.

Note: this container's sitecustomize imports jax at interpreter startup (to
register the axon TPU plugin), so env vars set here are too late — we must go
through jax.config, which works as long as no backend has been initialised.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
