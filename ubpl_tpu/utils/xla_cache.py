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
  UBPL_COMPILE_CACHE=<dir>        cache location (default
                                  ~/.cache/ubpl_tpu/xla)
  UBPL_NO_COMPILE_CACHE=1|true|yes  disable entirely
"""
import os
import warnings

_configured_dir = None   # dir actually in use once the first call succeeds


def enable_compilation_cache(path=None):
    """Idempotently point JAX's persistent compilation cache at a local dir.

    Safe to call from multiple entry points; the first call wins.  Returns
    the cache directory actually in use (the first caller's choice, even if
    a later caller asked for a different one), or None when disabled (env
    opt-out or a jax build without the feature).
    """
    global _configured_dir
    if os.environ.get("UBPL_NO_COMPILE_CACHE", "").lower() in (
            "1", "true", "yes"):
        return None
    if _configured_dir is not None:
        return _configured_dir
    import jax

    # Default location: a repo-local dir (beside the package) rather than
    # $HOME — this host wipes the home directory at round boundaries while
    # repo-local untracked files survive (BENCH_LAST.json across round 4),
    # so a warm cache only helps a driver-invoked restart if it lives here.
    repo_default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".xla_cache")
    home_default = os.path.join(os.path.expanduser("~"), ".cache",
                                "ubpl_tpu", "xla")
    path = (path or os.environ.get("UBPL_COMPILE_CACHE")
            or (repo_default if os.access(os.path.dirname(repo_default),
                                          os.W_OK) else home_default))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >=1s to compile, regardless of size —
        # the default min_entry_size can skip small-but-slow programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (AttributeError, ValueError, OSError) as e:
        # run uncached, but tell the operator: a silent miss means every
        # restart of a long TPU run pays full recompilation
        warnings.warn(f"persistent XLA compilation cache disabled ({e!r}); "
                      "runs will recompile on every restart", RuntimeWarning)
        return None
    _configured_dir = path
    return path
