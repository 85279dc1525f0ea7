"""Tests for the UBPL pseudo-label machinery, MLD optimizer, feature pool,
and uncertainty utilities."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from ubpl_tpu.train import pseudo as P
from ubpl_tpu.train.mld_optim import mld_combine, mld_optimizer
from ubpl_tpu.train.feature_pool import FeaturePool, get_feature_pools
from ubpl_tpu.ops import uncertainty as U


def test_assess_and_select():
    rng = np.random.default_rng(0)
    N, K = 20, 9
    gts = rng.uniform(40, 216, (N, K, 3))
    preds1 = gts[..., :2] + rng.normal(0, 3, (N, K, 2))
    preds2 = gts[..., :2] + rng.normal(0, 3, (N, K, 2))
    errors, accs, legal = P.assess_pseudo(preds1, gts, (1, 2), 0.2)
    assert errors.shape == (N, K) and accs.shape == (N, K)
    assert (accs >= 0).all() and (accs <= 1).all()

    dists = np.linalg.norm(preds1 - preds2, axis=-1)
    rel = P.reliability_from_dist(dists, legal, reliable_dist_min=1.0)
    assert rel.shape == (N, K) and rel.max() <= 1.0
    sel = P.select_pseudo(rel, errors, accs, reliable_pct=0.5,
                          reliable_thr=0.2)
    assert sel.enable.shape == (N, K)
    # roughly half selected at the median threshold
    assert 0.2 < sel.enable.mean() < 0.8
    assert sel.sel_counts[-1] == sel.enable.sum()
    # selected pseudo-labels should have lower mean error than the whole bank
    assert sel.sel_errs[-1] <= errors.mean() + 1e-9


def test_ensemble_assessment():
    rng = np.random.default_rng(1)
    N, K, A = 8, 5, 3
    gts = rng.uniform(40, 216, (N, K, 3))
    o1 = gts[..., :2] + rng.normal(0, 2, (N, K, 2))
    o2 = gts[..., :2] + rng.normal(0, 2, (N, K, 2))
    a1 = o1[None] + rng.normal(0, 1, (A, N, K, 2))
    a2 = o2[None] + rng.normal(0, 1, (A, N, K, 2))
    ens = P.assess_ensemble(o1, o2, a1, a2, gts, (1, 2), 0.2)
    assert ens.coords.shape == (N, K, 2)
    np.testing.assert_allclose(ens.w1 + ens.w2, 1.0, atol=1e-9)
    # ensemble coord lies on the segment between the two teachers
    lo = np.minimum(o1, o2) - 1e-6
    hi = np.maximum(o1, o2) + 1e-6
    assert ((ens.coords >= lo) & (ens.coords <= hi)).all()
    assert (ens.ext_dist < P.ILLEGAL).all()


def test_lma_cache():
    c = P.LMACache((2, 3))
    v1 = np.full((2, 3), 4.0)
    out1 = c.update(v1)
    np.testing.assert_allclose(out1, 4.0)           # single value
    out2 = c.update(np.full((2, 3), 8.0))
    np.testing.assert_allclose(out2, 8.0 * 0.8 + 4.0 * 0.2)
    out3 = c.update(np.full((2, 3), 2.0))
    np.testing.assert_allclose(out3, 2.0 * 0.5 + 8.0 * 0.3 + 4.0 * 0.2)


def test_mixed_uncertainty():
    unc, mix = P.mixed_uncertainty(np.array([1.0]), np.array([2.0]),
                                   np.array([4.0]), dist_thr_max=10.0)
    np.testing.assert_allclose(mix, [1.0 + 3.0])
    np.testing.assert_allclose(unc, [1.0 - np.exp(-4.0 / 5)])
    unc_bad, _ = P.mixed_uncertainty(np.array([50.0]), np.array([2.0]),
                                     np.array([4.0]), dist_thr_max=10.0)
    assert unc_bad[0] == P.ILLEGAL


def test_apply_pseudo_labels():
    from ubpl_tpu.data.arrays import PoseArrays
    arrays = PoseArrays(np.zeros((4, 8, 8, 3), np.uint8),
                        np.zeros((4, 3, 3), np.float32),
                        np.zeros((4, 3, 3), np.float32),
                        np.zeros((4,), np.int32), ["a", "b", "c", "d"])
    coords = np.full((2, 3, 2), 7.0)
    enable = np.array([[1, 0, 1], [0, 0, 0]])
    P.apply_pseudo_labels(arrays, [1, 2], coords, enable)
    assert (arrays.kps[1, 0] == [7, 7, 1]).all()
    assert (arrays.kps[1, 1] == 0).all()
    assert (arrays.kps[2] == 0).all()


def test_mld_combine():
    # executed reference semantics (accumulated .grad): the vertical is taken
    # against g_tot = g_pri + g_sec, gate on <g_sec, g_tot>; for
    # gp=[1,0], gs=[1,1], alpha=1: g_tot=[2,1], ip=3>0, cosine=3/sqrt(10),
    # vertical=[1,1]-0.6*[2,1]=[-0.2,0.4] -> final=[2.2,0.6]
    gp = {"w": jnp.array([1.0, 0.0])}
    gs = {"w": jnp.array([1.0, 1.0])}
    out = mld_combine(gp, gs, alpha=1.0)
    np.testing.assert_allclose(np.asarray(out["w"]), [2.2, 0.6], atol=1e-6)
    # anti-aligned primary that overwhelms the secondary closes the gate
    # (<g_sec, g_tot> = <[1,0],[-1,0]> < 0): plain gradient sum
    gp_neg = {"w": jnp.array([-2.0, 0.0])}
    gs2 = {"w": jnp.array([1.0, 0.0])}
    out2 = mld_combine(gp_neg, gs2, alpha=1.0)
    np.testing.assert_allclose(np.asarray(out2["w"]), [-1.0, 0.0], atol=1e-6)

    tx = mld_optimizer(optax.sgd(0.1), alpha=1.0)
    params = {"w": jnp.zeros(2)}
    st = tx.init(params)
    upd, st = tx.update((gp, gs), st, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), [-0.22, -0.06], atol=1e-6)


def test_mld_golden():
    """mld_combine vs the reference MLDOptim executed under torch
    (tools/make_goldens.py gold_mld; reference utils/MLDOptim.py:17-56)."""
    import os
    z = np.load(os.path.join(os.path.dirname(__file__), "goldens", "mld.npz"))
    for i in range(int(z["n_cases"])):
        alpha = float(z[f"alpha_{i}"])
        gp = {f"p{j}": jnp.asarray(z[f"case{i}_pri_{j}"])
              for j in range(int(z["n_params"]))}
        gs = {f"p{j}": jnp.asarray(z[f"case{i}_sec_{j}"])
              for j in range(int(z["n_params"]))}
        out = mld_combine(gp, gs, alpha=alpha)
        for j in range(int(z["n_params"])):
            np.testing.assert_allclose(np.asarray(out[f"p{j}"]),
                                       z[f"case{i}_final_{j}"],
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"case{i} param{j}")


def test_feature_pool():
    pool = FeaturePool(num_images=3, feature_shape=(4, 4, 2), max_length=3)
    feats = jnp.ones((2, 4, 4, 2))
    wm = jnp.tile(jnp.eye(2, 3), (2, 1, 1))
    flip = jnp.zeros((2,), bool)
    pool.save_features([0, 2], feats, wm, flip)
    pool.save_features([0, 2], 2 * feats, wm, flip)
    mix = pool.get_features_mixture([0], epo=1)
    assert mix.shape == (1, 4, 4, 2)
    assert 1.0 < float(mix.mean()) < 2.0
    grid = get_feature_pools(3, (4, 4, 2), 3, model_num=2, aug_num=2,
                             n_stack=3)
    assert len(grid) == 2 and len(grid[0]) == 2 and len(grid[0][0]) == 3


def test_uncertainty_utils():
    p1 = {"a": jnp.ones((3, 3))}
    p2 = {"a": jnp.ones((3, 3))}
    assert abs(float(U.model_similarity_cosine(p1, p2)) - 2.0) < 1e-6
    assert float(U.model_similarity_distance(p1, p2)) == 0.0
    preds_mul = jnp.zeros((4, 2, 3, 2)).at[0].add(1.0)
    mean = jnp.mean(preds_mul, axis=0)
    unc, w = U.uncertainty_from_distance(preds_mul, mean)
    assert unc.shape == (2, 3) and float(unc.max()) == 1.0
    np.testing.assert_allclose(np.asarray(w), np.exp(-np.asarray(unc)))
