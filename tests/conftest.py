"""Test configuration: force the local CPU backend with 8 virtual devices.

The container registers a remote-TPU (axon) backend at interpreter startup;
unit tests must compile locally instead. `jax.config.update` after import
still works because no backend has been initialized yet. Multi-chip TPU
hardware is unavailable in CI; sharding correctness is validated on a
host-platform 8-device mesh (same SPMD partitioner).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: repeated test runs skip recompilation.
import pathlib  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
