"""Persistent XLA compilation cache plumbing (ubpl_tpu/utils/xla_cache.py).

The reference recompiles nothing (torch eager); for the XLA framework the
persistent cache is what makes restarts/preemption-resume/sweeps cheap, so
its enable path is part of the production surface.
"""
import os

import jax
import pytest

from ubpl_tpu.utils import xla_cache


@pytest.fixture
def clean_cache_state(monkeypatch):
    """Reset module state and restore the process-global JAX cache dir."""
    monkeypatch.setattr(xla_cache, "_configured_dir", None)
    monkeypatch.delenv("UBPL_NO_COMPILE_CACHE", raising=False)
    prior = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prior)


def test_enable_sets_cache_dir(tmp_path, monkeypatch, clean_cache_state):
    target = str(tmp_path / "xlacache")
    monkeypatch.setenv("UBPL_COMPILE_CACHE", target)
    got = xla_cache.enable_compilation_cache()
    assert got == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    # idempotent: a second call (e.g. PoseEstimator after BaseTrainer)
    # reports the same dir without re-configuring
    assert xla_cache.enable_compilation_cache() == target


def test_first_call_wins(tmp_path, monkeypatch, clean_cache_state):
    monkeypatch.delenv("UBPL_COMPILE_CACHE", raising=False)
    first = str(tmp_path / "first")
    assert xla_cache.enable_compilation_cache(first) == first
    # a later caller asking for a different dir is told the dir actually
    # in use, not its own request
    assert xla_cache.enable_compilation_cache(
        str(tmp_path / "second")) == first
    assert jax.config.jax_compilation_cache_dir == first


@pytest.mark.parametrize("val", ["1", "true", "yes", "TRUE", "Yes"])
def test_env_opt_out(monkeypatch, val, clean_cache_state):
    monkeypatch.setenv("UBPL_NO_COMPILE_CACHE", val)
    assert xla_cache.enable_compilation_cache() is None
    assert xla_cache._configured_dir is None


def test_explicit_path_wins(tmp_path, monkeypatch, clean_cache_state):
    monkeypatch.setenv("UBPL_COMPILE_CACHE", str(tmp_path / "env"))
    explicit = str(tmp_path / "explicit")
    assert xla_cache.enable_compilation_cache(explicit) == explicit
    assert os.path.isdir(explicit)
