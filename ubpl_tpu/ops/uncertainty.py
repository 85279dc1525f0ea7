"""Model/prediction similarity + coordinate-spread uncertainty
(reference utils/evaluation.py:12-58, dormant analysis utilities).

Batched, pytree-native re-implementations.  Note: the reference's cosine
similarity concatenates the *second* model's params into both vectors after
the first layer (evaluation.py:19 uses p2 for v1 — a bug); we implement the
intended quantity 1 + cos(theta).
"""
import jax
import jax.numpy as jnp


def _flatten(params):
    return jnp.concatenate([x.reshape(-1) for x in
                            jax.tree_util.tree_leaves(params)])


def model_similarity_cosine(params1, params2):
    """1 + cosine similarity between two models' flattened parameters."""
    v1, v2 = _flatten(params1), _flatten(params2)
    return 1.0 + jnp.dot(v1, v2) / (jnp.linalg.norm(v1) * jnp.linalg.norm(v2))


def model_similarity_distance(params1, params2):
    """Sum of squared parameter distances (modelSimilarity_byDistance)."""
    return sum(jnp.sum((a - b) ** 2) for a, b in zip(
        jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params2)))


def preds_similarity_distance(preds1, preds2):
    """Mean coordinate distance between two prediction sets [N, K, 2]."""
    d = jnp.linalg.norm(jnp.asarray(preds1)[..., 0:2]
                        - jnp.asarray(preds2)[..., 0:2], axis=-1)
    return jnp.mean(d)


def uncertainty_from_distance(preds_mul, preds_mean):
    """MC-style coordinate-spread uncertainty (uncertainty_fromDistance).

    preds_mul: [M, B, K, 2] per-member predictions; preds_mean: [B, K, 2].
    Returns (unc [B, K] normalized to max 1, weights exp(-unc)).
    """
    d = jnp.linalg.norm(preds_mul[..., 0:2] - preds_mean[None, ..., 0:2],
                        axis=-1)                      # [M, B, K]
    unc = jnp.mean(d, axis=0)                         # [B, K]
    unc = unc / jnp.maximum(jnp.max(unc), 1e-12)
    return unc, jnp.exp(-unc)


def err_kps(preds, gts):
    """Per-keypoint coordinate error [B, K] (err_kps)."""
    return jnp.linalg.norm(jnp.asarray(preds)[..., 0:2]
                           - jnp.asarray(gts)[..., 0:2], axis=-1)


def err_kps_mul(preds_mul, gts):
    """[M, B, K] errors for stacked prediction sets (error_kps_mul)."""
    return jax.vmap(lambda p: err_kps(p, gts))(preds_mul)
