"""Persistent XLA compilation cache.

Every trainer/bench/serving entry point funnels through
:func:`enable_compilation_cache` so repeated runs of the same program
(same model/batch/mesh shapes) skip XLA recompilation entirely.  On TPU
the first MT_UBPL step compile costs tens of seconds (minutes on a loaded
1-core host); with the cache warm it is a disk read.

The reference has no analogue (torch eager mode recompiles nothing, but
also fuses nothing); for an XLA-based framework a persistent cache is
table stakes for production restarts, preemption recovery
(utils/preemption.py) and sweep drivers (train/exec.py) that re-enter the
same program many times.

Env knobs:
  UBPL_COMPILE_CACHE=<dir>   cache location (default ~/.cache/ubpl_tpu/xla)
  UBPL_NO_COMPILE_CACHE=1    disable entirely
"""
import os

_enabled = False


def enable_compilation_cache(path=None):
    """Idempotently point JAX's persistent compilation cache at a local dir.

    Safe to call from multiple entry points; the first call wins.  Returns
    the cache directory, or None when disabled (env opt-out or a jax build
    without the feature).
    """
    global _enabled
    if os.environ.get("UBPL_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    path = (path or os.environ.get("UBPL_COMPILE_CACHE")
            or os.path.join(os.path.expanduser("~"), ".cache", "ubpl_tpu",
                            "xla"))
    if _enabled:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >=1s to compile, regardless of size —
        # the default min_entry_size can skip small-but-slow programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (AttributeError, ValueError, OSError):
        return None  # older jax or read-only filesystem: run uncached
    _enabled = True
    return path
