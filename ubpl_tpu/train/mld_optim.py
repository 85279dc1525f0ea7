"""Multiple-Loss-Decomposition optimizer (reference utils/MLDOptim.py, dormant
upstream; wired here as ``Config.optimizer="mld"`` on the dual-branch trainers).

The reference's call pattern is two accumulating backward passes over one
graph (MLDOptim.py:18-56):

    secondary_loss_backward(L_sec)   # .grad  = g_sec   (stored as old_g)
    primary_loss_backward(L_pri)     # .grad += g_pri   -> g_tot = g_sec+g_pri

Because ``.backward`` ACCUMULATES, every quantity its "primary" math touches
is really the *total* gradient:

    ip      = <g_sec, g_tot>                                  (:36)
    cosine  = ip / (||g_tot|| * ||g_sec|| + eps)              (:46)
    vert    = g_sec - cosine * ||g_sec|| * g_tot / (||g_tot|| + eps)   (:53)
    g_final = g_tot - alpha * vert      if ip > 0             (:40,54)
    g_final = g_tot                     otherwise

i.e. the surgery removes (a fraction ``alpha`` of) the component of the
secondary gradient orthogonal to the COMBINED update direction — not, as the
paper-idealised form would have it, orthogonal to the primary gradient alone.
``mld_combine`` reproduces the executed semantics exactly; it is golden-tested
against the reference optimizer run under torch (tests/goldens/mld.npz).

Norms follow reference ``_grad_norm`` (:68-85): a single global L2 norm over
all parameters (the reference reads only ``param_groups[0]``, but its trainers
always build a single param group, so global == group-0).

BatchNorm note: the reference freezes BN running-stat momentum between the two
backwards (:87-99).  No forward runs between them, so stats still update
exactly once per step — which is what our single-forward/two-vjp structure
does naturally; nothing to replicate.

The gate ``ip > 0`` fires whenever <g_sec, g_sec + g_pri> > 0; since that
inner product contains ||g_sec||^2 it is almost always positive in practice —
another consequence of the accumulation that the executed-semantics golden
pins down.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def _global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(tree)))


def _inner(tree_a, tree_b):
    return sum(jnp.sum(a * b) for a, b in zip(
        jax.tree_util.tree_leaves(tree_a), jax.tree_util.tree_leaves(tree_b)))


def mld_combine(primary_grads, secondary_grads, alpha, eps=1e-12):
    """Combine two gradient trees exactly as the reference optimizer executes
    (accumulated-gradient semantics; see module docstring)."""
    total = jax.tree_util.tree_map(jnp.add, primary_grads, secondary_grads)
    ip = _inner(secondary_grads, total)
    tot_norm = _global_norm(total)
    sec_norm = _global_norm(secondary_grads)
    cosine = ip / (tot_norm * sec_norm + eps)

    def combine(gt, gs):
        vertical = gs - cosine * sec_norm * gt / (tot_norm + eps)
        return jnp.where(ip > 0, gt - alpha * vertical, gt)

    return jax.tree_util.tree_map(combine, total, secondary_grads)


class MLDState(NamedTuple):
    base: optax.OptState


def mld_optimizer(base_optimizer: optax.GradientTransformation, alpha: float,
                  eps: float = 1e-12):
    """optax wrapper: updates are computed from (primary, secondary) gradient
    pairs passed as a 2-tuple pytree prefix.

    Usage:
        tx = mld_optimizer(optax.adamw(lr), alpha=0.5)
        updates, st = tx.update((g_pri, g_sec), st, params)
    """

    def init(params):
        return MLDState(base_optimizer.init(params))

    def update(grad_pair, state, params=None):
        g_pri, g_sec = grad_pair
        merged = mld_combine(g_pri, g_sec, alpha, eps)
        updates, base_state = base_optimizer.update(merged, state.base, params)
        return updates, MLDState(base_state)

    return optax.GradientTransformation(init, update)
