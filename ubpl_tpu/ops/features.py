"""Feature statistics for the UBPL feature-decorrelation loss (FDC).

Re-implements reference utils/process.py:18-31 (features_cov) and the
EMA-weighted cross-epoch feature mixture (utils/process.py:33-44 +
utils/module.py FeaturePool) as batched device ops.

Layout: features are channel-last [B, N, Hf, Wf, C] (N = stack axis).
"""
import jax.numpy as jnp


def features_cov(f1, f2):
    """Mean |off-diagonal covariance| between two models' feature vectors.

    f1, f2: [B, N, Hf, Wf, C].  The two features are stacked as 2-vectors per
    (b, n, c, hw) position; covariance is taken over the HW dimension and the
    |cov[0,1]| entry averaged over c, n, b — exactly the reference's
    torch_cov path.  Returns (scalar, count=B*N*C).
    """
    B, N = f1.shape[0], f1.shape[1]
    C = f1.shape[-1]
    # [B, N, C, HW]
    v1 = jnp.moveaxis(f1, -1, 2).reshape(B, N, C, -1)
    v2 = jnp.moveaxis(f2, -1, 2).reshape(B, N, C, -1)
    hw = v1.shape[-1]
    m1 = v1 - jnp.mean(v1, axis=-1, keepdims=True)
    m2 = v2 - jnp.mean(v2, axis=-1, keepdims=True)
    # cov01[b,n,c] = sum_hw m1*m2 / (hw - 1)
    cov01 = jnp.sum(m1 * m2, axis=-1) / (hw - 1)
    return jnp.mean(jnp.abs(cov01)), B * N * C


def features_cov_nchw(f1, f2):
    """Same as features_cov but for [B, N, C, Hf, Wf] inputs (parity tests)."""
    return features_cov(jnp.moveaxis(f1, 2, -1), jnp.moveaxis(f2, 2, -1))


def feature_mixture_weight(epo, l=10):
    """Reference _feature_mixture_weight: smooth recency weight."""
    t = epo - l
    sign = jnp.sign(t)
    return (1 - sign + sign * jnp.exp(-sign * t)) / 2


def feature_mixture_across_epochs(features, max_count):
    """EMA-weighted mixture of per-epoch feature snapshots.

    features: [T, ...] stacked snapshots, newest last (reference
    feature_mixture_across_epoch).  max_count bounds how many are mixed.
    """
    T = features.shape[0]
    n = min(T, max_count)
    idxs = jnp.arange(n)
    w = feature_mixture_weight(idxs.astype(jnp.float32))
    sel = features[T - 1 - idxs]
    wsum = jnp.sum(w)
    return jnp.tensordot(w, sel, axes=1) / wsum
