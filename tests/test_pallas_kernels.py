"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from ubpl_tpu.ops.pallas import synthesize_heatmaps_pallas
from ubpl_tpu.ops.heatmap import synthesize_heatmaps

INTERPRET = jax.default_backend() != "tpu"


def test_pallas_synthesis_matches_golden(goldens):
    g = goldens("heatmap")
    hm, kps_new = synthesize_heatmaps_pallas(jnp.asarray(g["kps"]),
                                             interpret=INTERPRET)
    ref = np.transpose(g["heatmaps"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(hm), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kps_new), g["kps_new"], atol=1e-4)


def test_pallas_matches_xla_path():
    rng = np.random.default_rng(0)
    kps = jnp.asarray(rng.uniform(-5, 260, (6, 9, 3)).astype(np.float32))
    hm_x, kn_x = synthesize_heatmaps(kps)
    hm_p, kn_p = synthesize_heatmaps_pallas(kps, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(hm_p), np.asarray(hm_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kn_p), np.asarray(kn_x), atol=1e-5)
