"""Package integrity: every submodule imports cleanly.

Mirrors the reference's tests/test_package_install.py (a regression guard
for packaging bugs where submodules are silently missing from the wheel).
"""

import importlib

import pytest

SUBMODULES = [
    "tempest_tpu",
    "tempest_tpu.sampler",
    "tempest_tpu.core",
    "tempest_tpu.config",
    "tempest_tpu.state",
    "tempest_tpu.fused",
    "tempest_tpu.mcmc",
    "tempest_tpu.cluster",
    "tempest_tpu.student",
    "tempest_tpu.modes",
    "tempest_tpu.ops",
    "tempest_tpu.ops.tools",
    "tempest_tpu.ops.boundary",
    "tempest_tpu.steps.reweight",
    "tempest_tpu.steps.train",
    "tempest_tpu.steps.resample",
    "tempest_tpu.steps.mutate",
    "tempest_tpu.parallel.mesh",
    "tempest_tpu.parallel.distributed",
    "tempest_tpu.utils.checkpoint",
    "tempest_tpu.utils.progress",
    "tempest_tpu.utils.profiling",
    "tempest_tpu.utils.wrappers",
]


@pytest.mark.parametrize("name", SUBMODULES)
def test_importable(name):
    importlib.import_module(name)


def test_public_api():
    import tempest_tpu

    assert tempest_tpu.__all__ == ["Sampler"]
    assert callable(tempest_tpu.Sampler)
    assert isinstance(tempest_tpu.__version__, str)


def test_version_matches_pyproject():
    import pathlib
    import re

    import tempest_tpu

    text = pathlib.Path(__file__).resolve().parents[1].joinpath("pyproject.toml").read_text()
    m = re.search(r'^version = "(.*)"', text, re.M)
    assert m and m.group(1) == tempest_tpu.__version__
