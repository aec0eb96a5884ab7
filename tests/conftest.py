"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Must run before any module imports jax.
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (a tunneled
# real TPU) which makes every test compile remotely.  Unit tests run on the
# virtual 8-device CPU mesh; bench.py uses the real backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_tests() -> pathlib.Path:
    return REFERENCE / "tests"
