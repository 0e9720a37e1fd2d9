"""Test harness config: force CPU JAX with 8 fake devices.

SURVEY.md §4.3 — multi-device code paths (mesh, GSPMD, vmapped folds) are
exercised without a TPU cluster via
``--xla_force_host_platform_device_count=8``. Must run before jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU tests deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The harness environment pins JAX_PLATFORMS=axon (real TPU) and pre-imports
# jax via sitecustomize, so env vars alone are too late — force the platform
# through jax.config before any backend is initialized. Opt back in to
# real-TPU testing with TST_TEST_TPU=1.
if os.environ.get("TST_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: the suite is compile-dominated on this
    # single-core host (hundreds of small jit programs), and the CPU backend
    # honours the same cache as TPU. Warm reruns skip XLA entirely
    # (measured 7.4 s -> 0.28 s for a toy program; suite-level numbers in
    # docs/RESULTS.md). Opt out with TST_TEST_NO_CACHE=1 to measure cold.
    if os.environ.get("TST_TEST_NO_CACHE") != "1":
        cache_dir = os.environ.get(
            "TST_TEST_CACHE_DIR",
            os.path.expanduser("~/.cache/tst_test_jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU (opt-in)")
    config.addinivalue_line("markers", "slow: long-running integration test")


def pytest_collection_modifyitems(config, items):
    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    skip_tpu = pytest.mark.skip(reason="needs real TPU (run with JAX_PLATFORMS=tpu)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
