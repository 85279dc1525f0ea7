"""Occluder bank + device-side compositing tests."""
import jax
import jax.numpy as jnp
import numpy as np

from ubpl_tpu.data.occluders import build_occluder_bank, synthetic_occluders
from ubpl_tpu.ops.augment import composite_occluders


def test_bank_shapes():
    rgb, alpha = build_occluder_bank(bank_size=16, patch_res=32)
    assert rgb.shape == (16, 32, 32, 3)
    assert alpha.shape == (16, 32, 32)
    assert 0 <= alpha.min() and alpha.max() <= 1


def test_composite_changes_images():
    rgb, alpha = build_occluder_bank(bank_size=8, patch_res=32, seed=3)
    imgs = jnp.full((4, 64, 64, 3), 0.5, jnp.float32)
    out = composite_occluders(jax.random.PRNGKey(0), imgs, jnp.asarray(rgb),
                              jnp.asarray(alpha), num_occluders=4,
                              aug_rate=1.0)
    assert out.shape == imgs.shape
    diff = np.abs(np.asarray(out) - 0.5)
    assert diff.max() > 0.05          # something pasted
    assert (diff == 0).mean() > 0.05  # but not everything covered


def test_composite_respects_aug_rate():
    rgb, alpha = build_occluder_bank(bank_size=8, patch_res=32)
    imgs = jnp.full((6, 64, 64, 3), 0.5, jnp.float32)
    out = composite_occluders(jax.random.PRNGKey(0), imgs, jnp.asarray(rgb),
                              jnp.asarray(alpha), num_occluders=2,
                              aug_rate=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


def test_make_view_with_occlusion():
    from ubpl_tpu.config import Config
    from ubpl_tpu.train.common import make_view
    cfg = Config(use_occlusion=True, compute_dtype="float32")
    cfg.inp_res, cfg.out_res, cfg.kps_count = 64, 16, 3
    rgb, alpha = build_occluder_bank(bank_size=8, patch_res=32)
    bank = (jnp.asarray(rgb), jnp.asarray(alpha))
    imgs = (jnp.ones((2, 64, 64, 3)) * 128).astype(jnp.uint8)
    kps = jnp.zeros((2, 3, 3)).at[..., 0:2].set(32.0).at[..., 2].set(1.0)
    view = make_view(jax.random.PRNGKey(0), imgs, kps, jnp.zeros(3), cfg,
                     augment=True, occluder_bank=bank)
    assert view.images.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(view.images)).all()
