"""Test configuration.

The ambient environment may inject a remote-TPU (axon) interpreter hook that
forces ``jax_platforms="axon,cpu"`` at interpreter startup; with it active,
every op runs over a network tunnel.  ``jax.config.update`` before first
backend use reliably overrides it back to CPU.

We run tests on CPU with 8 virtual devices (multi-chip sharding tests use a
virtual mesh) and float64 enabled so scipy-oracle comparisons hold at tight
tolerances.  The TPU bench path (bench.py) keeps the ambient platform.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("GWINF_TPU_TESTS") == "1":
    # real-TPU test lane (tests/tpu/): keep the ambient platform and f32.
    # Run with:  GWINF_TPU_TESTS=1 python -m pytest tests/tpu -q
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# make the repo root importable regardless of pytest rootdir resolution
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import subprocess  # noqa: E402

import pytest  # noqa: E402

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def ensure_test_data():
    """Generate the synthetic injection bank + handoff artifact if absent or
    stale (older than the generator script)."""
    gen = os.path.join(_DATA_DIR, "make_synthetic_injections.py")
    target = os.path.join(_DATA_DIR, "pe_inj_file.h5")
    if not os.path.exists(target) or os.path.getmtime(target) < os.path.getmtime(gen):
        subprocess.run([sys.executable, gen], check=True)
    return target


@pytest.fixture(scope="session")
def pe_inj_file():
    return ensure_test_data()


@pytest.fixture(scope="session")
def pe_inj_synthetic_file():
    """The self-consistent synthetic-event artifact (the bench problem)."""
    ensure_test_data()
    return os.path.join(_DATA_DIR, "pe_inj_synthetic.h5")


@pytest.fixture(scope="session")
def injections_file():
    ensure_test_data()
    return os.path.join(_DATA_DIR, "injections.h5")
