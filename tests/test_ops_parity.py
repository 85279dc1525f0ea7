"""Bit-for-bit (float-tolerance) parity of the ops layer vs reference goldens.

Goldens were produced by running the reference implementation
(/root/reference) via tools/make_goldens.py; see that file for the covered
reference surfaces.
"""
import numpy as np
import jax.numpy as jnp

from ubpl_tpu.ops import transforms as T
from ubpl_tpu.ops import heatmap as HM
from ubpl_tpu.ops import pck as PCK
from ubpl_tpu.ops import features as F


def test_heatmap_synthesis(goldens):
    g = goldens("heatmap")
    hm, kps_new = HM.synthesize_heatmaps(jnp.asarray(g["kps"]))
    # golden layout [B, K, H, W] -> ours [B, H, W, K]
    ref = np.transpose(g["heatmaps"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(hm), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kps_new), g["kps_new"], atol=1e-4)


def test_transform_matrix_and_points(goldens):
    g = goldens("transform")
    res = tuple(g["res"])
    mats = T.get_transform_matrix(jnp.asarray(g["centers"]),
                                  jnp.asarray(g["scales"]), res,
                                  jnp.asarray(g["rots"]))
    np.testing.assert_allclose(np.asarray(mats), g["mats"], rtol=1e-5, atol=1e-5)

    outs = np.zeros_like(g["outs"])
    for i in range(len(g["pts"])):
        o = T.transform_points(jnp.asarray(g["pts"][i]),
                               jnp.asarray(g["centers"][i]),
                               jnp.asarray(g["scales"][i]), res,
                               invert=bool(g["invert"][i]),
                               rot=jnp.asarray(g["rots"][i]))
        outs[i] = np.asarray(o)
    # integer truncation can flip by 1 when the continuous value sits within
    # float32 noise of an integer; require exactness on >98% and <=1px else.
    diff = np.abs(outs - g["outs"])
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.98


def test_decode(goldens):
    g = goldens("decode")
    hm = jnp.asarray(np.transpose(g["hm"], (0, 2, 3, 1)))  # -> [B, H, W, K]
    preds_raw = HM.get_preds(hm)
    np.testing.assert_allclose(np.asarray(preds_raw), g["preds_raw"], atol=0)
    preds, scores = HM.decode_heatmaps(hm, jnp.asarray(g["centers"]),
                                       jnp.asarray(g["scales"]), res=(64, 64))
    np.testing.assert_allclose(np.asarray(scores), g["scores"], rtol=1e-6)
    diff = np.abs(np.asarray(preds) - g["preds"])
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.98


def test_pck(goldens):
    g = goldens("pck")
    errs, accs = PCK.acc_pck(jnp.asarray(g["preds"]), jnp.asarray(g["gts"]),
                             (1, 2), 0.2)
    np.testing.assert_allclose(np.asarray(errs), g["errs"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(accs), g["accs"], rtol=1e-5, atol=1e-6)


def test_warpmat(goldens):
    g = goldens("warpmat")
    # dataset.py:74 calls affine_getWarpmat(-angle, 1/scale); goldens recorded
    # that call, and ops.affine_warpmat(angle, scale) reproduces it.
    wm = T.affine_warpmat(jnp.asarray(g["angles"]), jnp.asarray(g["scales"]))
    np.testing.assert_allclose(np.asarray(wm), g["warpmats"], rtol=1e-5, atol=1e-6)


def test_affine_back(goldens):
    g = goldens("warpmat")
    hm = jnp.asarray(np.transpose(g["hm"], (0, 2, 3, 1)))
    back = T.affine_back(hm, jnp.asarray(g["warpmats"], dtype=jnp.float32),
                         jnp.asarray(g["isflip"]))
    ref = np.transpose(g["back"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(back), ref, atol=2e-5)


def test_features_cov(goldens):
    g = goldens("losses")
    c, n = F.features_cov_nchw(jnp.asarray(g["feat1"]), jnp.asarray(g["feat2"]))
    np.testing.assert_allclose(float(c), float(g["cov_raw"]), rtol=1e-4)
    assert n == int(g["cov_n"])
