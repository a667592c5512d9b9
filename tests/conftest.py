"""Test configuration: force the local CPU backend with 8 virtual devices.

The container registers a remote-TPU (axon) backend at interpreter startup;
unit tests must compile locally instead. `jax.config.update` after import
still works because no backend has been initialized yet. Multi-chip TPU
hardware is unavailable in CI; sharding correctness is validated on a
host-platform 8-device mesh (same SPMD partitioner).

On-device smoke tests (`-m tpu`, tests/test_tpu_smoke.py) are the
exception: run them with TEMPEST_TPU_TESTS=1 to keep the real TPU backend:

    TEMPEST_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -m tpu -q
"""

import os

_USE_TPU = os.environ.get("TEMPEST_TPU_TESTS", "") not in ("", "0")

if not _USE_TPU:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: repeated test runs skip recompilation.
import pathlib  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    """Skip `tpu`-marked tests unless a TPU-family backend is active."""
    import pytest

    backend = None

    def _backend():
        nonlocal backend
        if backend is None:
            try:
                backend = jax.default_backend()
            except RuntimeError:
                backend = "none"
        return backend

    skip_tpu = pytest.mark.skip(
        reason="needs the real TPU backend (run with TEMPEST_TPU_TESTS=1)"
    )
    for item in items:
        if "tpu" in item.keywords and (
            not _USE_TPU or _backend() not in ("tpu", "axon")
        ):
            item.add_marker(skip_tpu)
