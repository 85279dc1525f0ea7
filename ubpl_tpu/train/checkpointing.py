"""Checkpoint save/restore with real resume (orbax).

The reference saves model+EMA+optimizer state dicts every epoch and copies a
best snapshot (utils/base/comm.py:91-103) but never wires resume
(start_epoch pinned 0).  Here: orbax checkpoints of the full train-state
pytree plus metadata, `latest`/`best` retention, and `restore_checkpoint`
actually resuming (params, EMA, optimizer state, epoch, counters).
"""
import glob
import os
import shutil
import warnings

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_DIR = "ckpts"
# one checkpointer per process.  Note the save path is also guarded below:
# writers racing on the shared "<target>.orbax-checkpoint-tmp" path (e.g.
# two runs accidentally pointed at the same base_path — observed here as
# NOT_FOUND from write_metadata_after_commits) must degrade to a warning,
# never kill training.
_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.PyTreeCheckpointer()
    return _CKPTR


def _paths(base_path):
    d = os.path.join(os.path.abspath(base_path), _CKPT_DIR)
    return os.path.join(d, "checkpoint"), os.path.join(d, "checkpoint_best")


def save_checkpoint(base_path, epoch, state, is_best=False, extra=None):
    """Write the full state pytree each epoch; mirror to `best` when asked.

    A failed write must never abort training (the reference's torch.save has
    the same fire-and-forget posture): IO errors are logged and the previous
    intact checkpoint stays in place.
    """
    latest, best = _paths(base_path)
    payload = {
        "state": jax.tree_util.tree_map(np.asarray, _as_dict(state)),
        "meta": {"current_epoch": epoch, **(extra or {})},
    }
    ckptr = _checkpointer()
    for target, write in ((latest, True), (best, is_best)):
        if not write:
            continue
        # Crash-safe ordering: write to a sibling staging dir first and only
        # replace the previous checkpoint after the save has fully committed,
        # so a failed write always leaves the prior intact checkpoint in
        # place.  (orbax itself also stages to
        # "<dir>.orbax-checkpoint-tmp-<ts>" before renaming.)
        staged = f"{target}.new"
        try:
            if not os.path.exists(target) and os.path.exists(staged):
                # adopt a committed crash-window copy (rename didn't land
                # last run) instead of deleting the only checkpoint
                os.rename(staged, target)
            shutil.rmtree(staged, ignore_errors=True)
            ckptr.save(staged, payload)
            retired = f"{target}.old"
            shutil.rmtree(retired, ignore_errors=True)
            if os.path.exists(target):
                os.rename(target, retired)
            os.rename(staged, target)
            shutil.rmtree(retired, ignore_errors=True)
            # stale orbax staging dirs from an earlier crashed (SIGKILLed)
            # save are cleaned on the next success, not only on exception
            for stale in (glob.glob(f"{target}.orbax-checkpoint-tmp*")
                          + glob.glob(f"{staged}.orbax-checkpoint-tmp*")):
                shutil.rmtree(stale, ignore_errors=True)
        except Exception as e:  # noqa: BLE001 — keep training alive
            warnings.warn(f"checkpoint save to {target} failed "
                          f"(epoch {epoch + 1}): {e}")
            # NOTE: `staged` is deliberately NOT deleted here — if
            # ckptr.save committed it but a rename failed, it is the newest
            # complete checkpoint and restore_checkpoint can read it (the
            # next successful save overwrites it).  Only orbax's own
            # tmp dirs (incomplete by construction) are removed.
            for stale in (glob.glob(f"{target}.orbax-checkpoint-tmp*")
                          + glob.glob(f"{staged}.orbax-checkpoint-tmp*")):
                shutil.rmtree(stale, ignore_errors=True)


def restore_checkpoint(base_path, state=None, best=False):
    """Restore (state, meta); `state` provides the pytree structure so
    optax NamedTuple states come back typed (orbax alone restores dicts)."""
    latest, best_p = _paths(base_path)
    target = best_p if best else latest
    if not os.path.exists(target):
        # crash-window fallbacks, newest first: a committed staging dir
        # whose final rename didn't land ("<t>.new" — orbax's own save is
        # atomic, so its existence implies completeness), then the retired
        # previous checkpoint ("<t>.old") stranded between the two renames.
        for cand in (f"{target}.new", f"{target}.old"):
            if os.path.exists(cand):
                warnings.warn(f"checkpoint {target} missing; restoring the "
                              f"crash-window fallback {cand}")
                target = cand
                break
        else:
            return None, None
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(target)
    restored, meta = payload["state"], payload["meta"]
    if state is not None:
        # re-restore with the live pytree as the structure template
        template = {"state": jax.tree_util.tree_map(np.asarray,
                                                    _as_dict(state)),
                    "meta": meta}
        payload = ckptr.restore(target, item=template)
        restored = type(state)(**payload["state"])
        meta = payload["meta"]
    return restored, meta


def _as_dict(state):
    if hasattr(state, "_asdict"):
        return dict(state._asdict())
    return dict(state)
