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


# ---------------------------------------------------------------------------
# Test tiers (measured on the 1-core dev host, 2026-08-19):
#   smoke -- kernel/unit files totalling < 2 min in ONE pytest invocation;
#            the cheap "is the tree sane" gate (pytest -m smoke).
#   slow  -- files measured > 30 s each; excluded by -m "not slow" (~5 min).
# Full suite: ~15-20 min uncontended (33 files, all green as of r4 start).
# ---------------------------------------------------------------------------

_SMOKE_FILES = {
    "test_structs", "test_windows", "test_filters", "test_hough",
    "test_detector_units", "test_native_resize", "test_imgloader",
    "test_stack", "test_raw_pipeline", "test_onnx_fixture",
    "test_videowrapper_pyav", "test_concurrency", "test_checkpoint",
    "test_pallas",
}

_SLOW_FILES = {
    "test_reference_parity",   # 196 s: runs the actual reference in-process
    "test_temporal_dldet",     # 67 s
    "test_recheck_mldet",      # 61 s
    "test_misc_components",    # 58 s
    "test_videowriter_ffmpeg", # 56 s
    "test_yolo",               # 55 s
    "test_detection_corpus",   # 39 s
    "test_recheck_corpus",     # 35 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SMOKE_FILES:
            item.add_marker(pytest.mark.smoke)
        if mod in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
