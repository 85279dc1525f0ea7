"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (real TPU); tests must run on a
virtual 8-device CPU platform, and the env var alone is overridden by the
plugin, so we force the platform through jax.config before any backend use.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
