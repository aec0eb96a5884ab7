"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Must run before any module imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_tests() -> pathlib.Path:
    return REFERENCE / "tests"
