"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Mirrors the reference's parallel==serial determinism strategy
(reference tests/test_stardis_full.py:17-27) by making every test run able
to exercise real sharding on host CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The axon sitecustomize forces jax_platforms="axon,cpu" regardless of the
# JAX_PLATFORMS env var; override post-import so tests run on the virtual
# 8-device CPU mesh instead of round-tripping through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--generate-reference",
        action="store_true",
        default=False,
        help="regenerate golden regression data instead of comparing",
    )
    parser.addoption(
        "--stardis-regression-data",
        default=None,
        help="path to an external regression-data directory",
    )


@pytest.fixture(scope="session")
def builtin_atom_data():
    from stardis_tpu.atom_data import build_builtin_atom_data

    return build_builtin_atom_data(max_atomic_number=30)


@pytest.fixture(scope="session")
def synthetic_sun_path(tmp_path_factory):
    from stardis_tpu.io.synthetic import write_marcs_file

    path = tmp_path_factory.mktemp("models") / "sun_synth.mod"
    write_marcs_file(path)
    return path


@pytest.fixture(scope="session")
def example_tracing_nus():
    """H-alpha window 6560-6570 AA at 0.1 AA (reference conftest.py:52-56)."""
    from stardis_tpu import units as u

    lambdas = np.arange(6560, 6570, 0.1)
    return u.Quantity(lambdas, u.AA).to(u.Hz, u.spectral())


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tier (big sharding compiles, ~5 min)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "test_sharding" in item.nodeid:
            item.add_marker(pytest.mark.slow)
