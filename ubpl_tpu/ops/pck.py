"""PCK evaluation as fixed-shape masked reductions (reference utils/evaluation.py:92-139).

The reference computes, per batch:
  * dists[k, i]      = ||pred - gt||            if gt_x > 1 and gt_y > 1 else -1
  * dists_ref[k, i]  = dists / ||gt[ref0] - gt[ref1]||  (same -1 convention)
  * errs[k]  = mean over the batch of dists *including* the -1 entries
               (a reference quirk we reproduce faithfully)
  * errs[K]  = mean over all K per-joint errs
  * accs[k]  = fraction of valid (!= -1) dists_ref below thr, or -1 if none
  * accs[K]  = mean of per-joint accs that are >= 0 (0 if none)
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("pck_ref", "pck_thr"))
def acc_pck(preds, gts, pck_ref, pck_thr):
    """preds: [B, K, 2]; gts: [B, K, >=2] (only x, y used).

    Returns (errs [K+1], accs [K+1]) matching the reference layout.
    """
    preds = preds.astype(jnp.float32)
    gts = gts.astype(jnp.float32)
    B, K = preds.shape[0], preds.shape[1]
    r0, r1 = pck_ref
    norm = jnp.linalg.norm(gts[:, r0, 0:2] - gts[:, r1, 0:2], axis=-1)  # [B]
    d = jnp.linalg.norm(preds[:, :, 0:2] - gts[:, :, 0:2], axis=-1)    # [B, K]
    valid = (gts[:, :, 0] > 1) & (gts[:, :, 1] > 1)                    # [B, K]
    dists = jnp.where(valid, d, -1.0)
    dists_ref = jnp.where(valid, d / norm[:, None], -1.0)

    # errs: batch mean including -1 sentinels (reference utils/evaluation.py:98-104)
    errs_k = jnp.mean(dists, axis=0)                                   # [K]
    errs = jnp.concatenate([errs_k, jnp.mean(errs_k)[None]])

    # accs: fraction of valid below thr; -1 when a joint has no valid sample
    n_valid = jnp.sum(valid, axis=0)                                   # [K]
    n_below = jnp.sum((dists_ref != -1) & (dists_ref < pck_thr), axis=0)
    accs_k = jnp.where(n_valid > 0, n_below / jnp.maximum(n_valid, 1), -1.0)
    acc_mask = accs_k >= 0
    acc_num = jnp.sum(acc_mask)
    acc_mean = jnp.where(acc_num > 0,
                         jnp.sum(jnp.where(acc_mask, accs_k, 0.0)) / jnp.maximum(acc_num, 1),
                         0.0)
    accs = jnp.concatenate([accs_k, acc_mean[None]])
    return errs, accs


def acc_pck_pseudo(error, norm, pck_thr):
    """Reference acc_pck_pseudo: 1 if error/norm < thr else 0 (batched)."""
    return (error / norm < pck_thr).astype(jnp.int32)
