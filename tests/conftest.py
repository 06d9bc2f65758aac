"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
(``jax.sharding.Mesh``) is exercised without TPU hardware.

Note on the environment: a sitecustomize hook imports jax at interpreter
start with ``JAX_PLATFORMS=axon`` (the TPU tunnel), so env-var changes made
afterwards are ignored — the backend must be switched through
``jax.config`` before any backend is initialised.
"""

import pathlib

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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
