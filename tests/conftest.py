"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Must run before any module imports jax.
"""

import os

# Force CPU with 8 virtual devices.  The ambient environment's
# sitecustomize pre-imports jax and registers a tunneled real-TPU
# backend ("axon") at interpreter start, so plain env vars are too
# late — use jax.config after import instead.  bench.py keeps the real
# backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from gmap_gsnap_tpu.utils import jaxenv  # noqa: E402

jaxenv.enable_compilation_cache()

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_tests() -> pathlib.Path:
    return REFERENCE / "tests"
