"""Multiple-Loss-Decomposition optimizer (reference utils/MLDOptim.py, dormant).

Two-loss gradient surgery: when the secondary loss's gradient conflicts less
than orthogonally with the primary gradient (positive inner product), keep
only the component of the secondary gradient orthogonal to the primary one:

    vertical = g_sec - cos(g_sec, g_pri) * ||g_sec|| * g_pri / ||g_pri||
    g_final  = g_pri + g_sec - alpha * vertical        (inner product > 0)
    g_final  = g_pri + g_sec                            (otherwise)

(The reference accumulates both backward passes into .grad, then subtracts
alpha * vertical — equivalent to the formula above.)  It also freezes BN
running-stat momentum during the second backward; in JAX there is no
in-place stats mutation, so callers simply reuse the first forward's
batch_stats — noted here for parity.

Here the surgery is a pure function over gradient pytrees plus an optax
wrapper, both jit-friendly.
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
    """Combine the two gradient trees with the reference's decomposition."""
    ip = _inner(secondary_grads, primary_grads)
    pri_norm = _global_norm(primary_grads)
    sec_norm = _global_norm(secondary_grads)
    cosine = ip / (pri_norm * sec_norm + eps)

    def combine(gp, gs):
        vertical = gs - cosine * sec_norm * gp / (pri_norm + eps)
        corrected = gp + gs - alpha * vertical
        plain = gp + gs
        return jnp.where(ip > 0, corrected, plain)

    return jax.tree_util.tree_map(combine, primary_grads, secondary_grads)


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
