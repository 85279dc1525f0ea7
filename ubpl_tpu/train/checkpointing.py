"""Checkpoint save/restore with real resume (orbax).

The reference saves model+EMA+optimizer state dicts every epoch and copies a
best snapshot (utils/base/comm.py:91-103) but never wires resume
(start_epoch pinned 0).  Here: orbax checkpoints of the full train-state
pytree plus metadata, `latest`/`best` retention, and `restore_checkpoint`
actually resuming (params, EMA, optimizer state, epoch, counters).
"""
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_DIR = "ckpts"


def _paths(base_path):
    d = os.path.join(os.path.abspath(base_path), _CKPT_DIR)
    return os.path.join(d, "checkpoint"), os.path.join(d, "checkpoint_best")


def save_checkpoint(base_path, epoch, state, is_best=False, extra=None):
    """Write the full state pytree each epoch; mirror to `best` when asked."""
    latest, best = _paths(base_path)
    payload = {
        "state": jax.tree_util.tree_map(np.asarray, _as_dict(state)),
        "meta": {"current_epoch": epoch, **(extra or {})},
    }
    ckptr = ocp.PyTreeCheckpointer()
    for target, write in ((latest, True), (best, is_best)):
        if not write:
            continue
        if os.path.exists(target):
            shutil.rmtree(target)
        ckptr.save(target, payload)


def restore_checkpoint(base_path, state=None, best=False):
    """Restore (state, meta); `state` provides the pytree structure so
    optax NamedTuple states come back typed (orbax alone restores dicts)."""
    latest, best_p = _paths(base_path)
    target = best_p if best else latest
    if not os.path.exists(target):
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
