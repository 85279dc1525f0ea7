"""Property tests formalizing the reference's visual debug checks
(SURVEY §4: aug ∘ aug⁻¹ ≈ id, heatmap synth ∘ decode ≈ id).

The reference verified these by writing annotated images to disk for
eyeballing (datasets/dataset.py:77-139, projects/MT.py:184-223); here they
are numeric invariants.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ubpl_tpu.config import Config
from ubpl_tpu.ops import augment as A
from ubpl_tpu.ops import heatmap as HM
from ubpl_tpu.ops import transforms as T
from ubpl_tpu.train.common import make_view


def _cfg():
    cfg = Config(compute_dtype="float32")
    cfg.inp_res, cfg.out_res, cfg.kps_count = 256, 64, 5
    return cfg


def _batch(rng, B=6, K=5, R=256):
    imgs = jnp.asarray(rng.random((B, R, R, 3)), jnp.float32)
    kps = np.zeros((B, K, 3), np.float32)
    kps[..., 0:2] = rng.uniform(60, 196, (B, K, 2))
    kps[..., 2] = 1.0
    return imgs, jnp.asarray(kps)


def test_synth_decode_roundtrip():
    """decode(synthesize(kps)) lands within heatmap quantization (stride 4)."""
    rng = np.random.default_rng(0)
    _, kps = _batch(rng)
    hm, kps_new = HM.synthesize_heatmaps(kps)
    B = kps.shape[0]
    center = jnp.full((B, 2), 128.0)
    scale = jnp.full((B,), 256.0 / 200.0)
    coords, scores = HM.decode_heatmaps(hm, center, scale, res=(64, 64))
    err = np.abs(np.asarray(coords) - np.asarray(kps[..., 0:2]))
    assert err.max() <= 4.0 + 1e-6  # one heatmap cell
    assert (np.asarray(scores) > 0.9).all()


def test_augmented_synth_decode_consistency():
    """Synthesis on augmented kps decodes back to those augmented kps."""
    rng = np.random.default_rng(1)
    imgs, kps = _batch(rng)
    cfg = _cfg()
    view = make_view(jax.random.PRNGKey(3), (imgs * 255).astype(jnp.uint8),
                     kps, jnp.zeros(3), cfg, augment=True)
    B = kps.shape[0]
    center = jnp.full((B, 2), 128.0)
    scale = jnp.full((B,), 256.0 / 200.0)
    coords, _ = HM.decode_heatmaps(view.heatmaps, center, scale, res=(64, 64))
    gate = np.asarray(view.gate) > 0
    err = np.abs(np.asarray(coords) - np.asarray(view.kps[..., 0:2]))[gate]
    assert err.max() <= 4.0 + 1e-6


def test_affine_back_roundtrip():
    """Heatmaps of augmented kps, warped back by the inverse warpmat (+
    un-flip), decode near the ORIGINAL keypoints — the reference's
    test_affine_back debug check (projects/MT.py:187-204) as an assertion.

    The warpmat inverts only rotation/scale about the center (translation is
    zeroed, reference utils/augment.py:163), so the flip-mirroring of the
    center cancels and decode uses the fixed image center with scale 1*...
    """
    rng = np.random.default_rng(2)
    imgs, kps = _batch(rng)
    cfg = _cfg()
    view = make_view(jax.random.PRNGKey(11), (imgs * 255).astype(jnp.uint8),
                     kps, jnp.zeros(3), cfg, augment=True)
    back = T.affine_back(view.heatmaps, view.warpmat, view.isflip)
    B = kps.shape[0]
    # the reference decodes the back-warped heatmap with scale=1
    # (datasets/dataset.py:115) — that cancels the warpmat's 1/scale and the
    # 200px-unit decode stride, recovering original-image coordinates
    center = jnp.full((B, 2), 128.0)
    coords, _ = HM.decode_heatmaps(back, center, jnp.ones((B,)), res=(64, 64))
    gate = np.asarray(view.gate) > 0
    err = np.linalg.norm(np.asarray(coords)
                         - np.asarray(kps[..., 0:2]), axis=-1)[gate]
    assert np.median(err) < 4.0   # ~one heatmap cell
    assert err.max() < 10.0


def test_flip_only_roundtrip_exact():
    """With rotation/scale disabled, flip + warp-back is near-exact."""
    rng = np.random.default_rng(4)
    imgs, kps = _batch(rng)
    cfg = _cfg()
    cfg.scale_range, cfg.rot_range = 1e-6, 1e-6
    view = make_view(jax.random.PRNGKey(5), (imgs * 255).astype(jnp.uint8),
                     kps, jnp.zeros(3), cfg, augment=True)
    back = T.affine_back(view.heatmaps, view.warpmat, view.isflip)
    B = kps.shape[0]
    center = jnp.full((B, 2), 128.0)
    coords, _ = HM.decode_heatmaps(back, center, jnp.ones((B,)), res=(64, 64))
    gate = np.asarray(view.gate) > 0
    err = np.linalg.norm(np.asarray(coords)
                         - np.asarray(kps[..., 0:2]), axis=-1)[gate]
    assert err.max() < 6.0
