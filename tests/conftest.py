"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
(`jax.sharding.Mesh`) is exercised without TPU hardware.  Must be set before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
