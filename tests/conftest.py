"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
(`jax.sharding.Mesh`) is exercised without TPU hardware.  Must be set before
jax is imported anywhere.
"""

import os
import sys

# force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which must not be claimed by unit tests.  The axon site hook also
# deadlocks jax initialisation when multiple host devices are forced, so it
# is stripped from the import path entirely.
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if p and ".axon_site" not in p
)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA


@pytest.fixture(scope="session")
def input_dir() -> pathlib.Path:
    return DATA / "input"


@pytest.fixture(scope="session")
def expected_dir() -> pathlib.Path:
    return DATA / "expected"
