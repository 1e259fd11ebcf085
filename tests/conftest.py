"""Test config: run JAX on a virtual 8-device CPU mesh.

Real-TPU behavior is validated by bench.py / the driver; unit tests must be
hermetic and exercise the multi-chip sharding paths on host CPU devices.

NOTE: this environment's sitecustomize registers the axon TPU plugin and
forces JAX_PLATFORMS=axon programmatically, so the env-var route
(JAX_PLATFORMS / --xla_force_host_platform_device_count) is ignored; the
jax.config.update calls below are the effective override.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(20260816)
