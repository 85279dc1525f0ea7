"""Persistent XLA compilation cache plumbing (ubpl_tpu/utils/xla_cache.py).

The reference recompiles nothing (torch eager); for the XLA framework the
persistent cache is what makes restarts/preemption-resume/sweeps cheap, so
its enable path is part of the production surface.
"""
import os

import jax

from ubpl_tpu.utils import xla_cache


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(xla_cache, "_enabled", False)
    monkeypatch.delenv("UBPL_NO_COMPILE_CACHE", raising=False)
    target = str(tmp_path / "xlacache")
    monkeypatch.setenv("UBPL_COMPILE_CACHE", target)
    got = xla_cache.enable_compilation_cache()
    assert got == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    # idempotent: a second call (e.g. PoseEstimator after BaseTrainer)
    # reports the same dir without re-configuring
    assert xla_cache.enable_compilation_cache() == target


def test_env_opt_out(monkeypatch):
    monkeypatch.setattr(xla_cache, "_enabled", False)
    monkeypatch.setenv("UBPL_NO_COMPILE_CACHE", "1")
    assert xla_cache.enable_compilation_cache() is None
    assert not xla_cache._enabled


def test_explicit_path_wins(tmp_path, monkeypatch):
    monkeypatch.setattr(xla_cache, "_enabled", False)
    monkeypatch.delenv("UBPL_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("UBPL_COMPILE_CACHE", str(tmp_path / "env"))
    explicit = str(tmp_path / "explicit")
    assert xla_cache.enable_compilation_cache(explicit) == explicit
    assert os.path.isdir(explicit)
