"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set flags before jax initializes; pytest imports this first.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

GOLDENS = os.path.join(REPO, "tests", "goldens")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def goldens():
    """Load golden fixtures generated from the reference implementation."""
    def load(name):
        return np.load(os.path.join(GOLDENS, name + ".npz"))
    return load
