"""Loss + schedule parity vs reference goldens (reference utils/losses.py,
utils/parameters.py)."""
import numpy as np
import jax.numpy as jnp

from ubpl_tpu.train import losses as L
from ubpl_tpu.train import schedules as S


def _to_hwk(x):
    """[..., K, H, W] -> [..., H, W, K]"""
    return np.moveaxis(x, -3, -1)


def test_joint_mse(goldens):
    g = goldens("losses")
    s, n = L.joint_mse(jnp.asarray(_to_hwk(g["preds"])),
                       jnp.asarray(_to_hwk(g["gts"])),
                       jnp.asarray(g["gate"]), jnp.asarray(g["sw_pos"]),
                       use_gate=True, use_sample_weight=True)
    np.testing.assert_allclose(float(s), float(g["mse_sum"]), rtol=1e-5)
    assert int(n) == int(g["mse_n"])

    s, n = L.joint_mse(jnp.asarray(_to_hwk(g["preds"])),
                       jnp.asarray(_to_hwk(g["gts"])))
    np.testing.assert_allclose(float(s), float(g["mse_plain_sum"]), rtol=1e-5)
    assert int(n) == int(g["mse_plain_n"])


def test_joint_dist(goldens):
    g = goldens("losses")
    s, n = L.joint_dist(jnp.asarray(_to_hwk(g["preds"][:, -1])),
                        jnp.asarray(_to_hwk(g["preds2"][:, -1])))
    np.testing.assert_allclose(float(s), float(g["dist_sum"]), rtol=1e-5)
    assert int(n) == int(g["dist_n"])


def test_joint_pseudo3(goldens):
    g = goldens("losses")
    s, stats = L.joint_pseudo3(jnp.asarray(_to_hwk(g["preds"])),
                               jnp.asarray(_to_hwk(g["teachers"])),
                               jnp.asarray(g["sw_nega"]), score_thr=0.95)
    np.testing.assert_allclose(float(s), float(g["p3_sum"]), rtol=1e-4)
    assert int(stats.num_pseudo) == int(g["p3_n"])
    assert int(stats.num_selected) == int(g["p3_nsel"])
    np.testing.assert_allclose(np.asarray(stats.joint_score_mean),
                               g["p3_jsm"], rtol=1e-5)


def test_joint_pseudo_v1(goldens):
    g = goldens("losses")
    s, stats = L.joint_pseudo(jnp.asarray(_to_hwk(g["preds"])),
                              jnp.asarray(_to_hwk(g["teachers"])),
                              jnp.asarray(g["sw_nega"]), score_thr=0.0008)
    np.testing.assert_allclose(float(s), float(g["p1_sum"]), rtol=1e-4)
    assert int(stats.num_pseudo) == int(g["p1_n"])
    assert int(stats.num_selected) == int(g["p1_nsel"])
    np.testing.assert_allclose(np.asarray(stats.joint_score_mean),
                               g["p1_jsm"], rtol=1e-4)


def test_joint_pseudo_v2(goldens):
    g = goldens("losses")
    s, stats, thr1, thr2 = L.joint_pseudo2(
        jnp.asarray(_to_hwk(g["preds"])), jnp.asarray(_to_hwk(g["teachers"])),
        jnp.asarray(g["sw_nega"]), sel_rate=0.4)
    np.testing.assert_allclose(float(s), float(g["p2_sum"]), rtol=1e-4)
    assert int(stats.num_pseudo) == int(g["p2_n"])
    assert int(stats.num_selected) == int(g["p2_nsel"])
    np.testing.assert_allclose(np.asarray(thr1), g["p2_thr1"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(thr2), g["p2_thr2"], rtol=1e-5)


def test_joint_dist_mt_v1(goldens):
    g = goldens("losses")
    sw = jnp.asarray(np.array([1., 1., 7., 7.], dtype=np.float32))
    s, n = L.joint_dist_mt(jnp.asarray(_to_hwk(g["preds"][:, -1])),
                           jnp.asarray(_to_hwk(g["preds2"][:, -1])),
                           sample_weight=sw, use_sample_weight=True,
                           sel_rate=0.4)
    np.testing.assert_allclose(float(s), float(g["mt1_sum"]), rtol=1e-4)
    assert int(n) == int(g["mt1_n"])


def test_joint_dist_mt2(goldens):
    g = goldens("losses")
    sw = jnp.asarray(np.array([1., 1., 7., 7.], dtype=np.float32))
    s, n, stats = L.joint_dist_mt2(jnp.asarray(_to_hwk(g["preds"][:, -1])),
                                   jnp.asarray(_to_hwk(g["preds2"][:, -1])),
                                   sample_weight=sw, use_sample_weight=True,
                                   score_thr=0.95)
    np.testing.assert_allclose(float(s), float(g["mt2_sum"]), rtol=1e-4)
    assert int(n) == int(g["mt2_n"])
    assert int(stats.num_pseudo) == int(g["mt2_np"])
    assert int(stats.num_selected) == int(g["mt2_nsel"])
    np.testing.assert_allclose(np.asarray(stats.joint_score_mean),
                               g["mt2_jsm"], rtol=1e-5)


def test_joint_feature_dist(goldens):
    g = goldens("losses")
    f1 = jnp.asarray(np.moveaxis(g["feat1"], 2, -1))
    f2 = jnp.asarray(np.moveaxis(g["feat2"], 2, -1))
    s, n = L.joint_feature_dist(f1, f2)
    np.testing.assert_allclose(float(s), float(g["fdist_sum"]), rtol=1e-4)
    assert int(n) == int(g["fdist_n"])


def test_schedules(goldens):
    g = goldens("schedules")
    for e in g["epochs"]:
        e = int(e)
        np.testing.assert_allclose(S.cons_weight(e), g["cons"][e], rtol=1e-8)
        np.testing.assert_allclose(S.pseudo_weight(e), g["pseudo"][e], rtol=1e-8)
        np.testing.assert_allclose(S.fdl_weight(e), g["fdl"][e], rtol=1e-8)
        np.testing.assert_allclose(S.ema_alpha(e), g["alpha"][e], rtol=1e-12)


def test_avg_counter():
    c = L.AvgCounter()
    c.update(2.0, 3)
    c.update(4.0, 1)
    assert abs(c.avg - 10.0 / 4) < 1e-12
    cs = L.AvgCounters(2)
    cs.update(3, 1.0, 2)  # auto-extends like the reference
    assert len(cs.counters) == 4
