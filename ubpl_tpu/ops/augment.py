"""Device-side batched data augmentation (pure XLA, runs inside the jitted
training step — zero per-sample host work).

Re-designs the reference's per-sample host pipeline (utils/augment.py:
fliplr :184-227, noisy_mean :261-267, affine :19-24/86-156) as batched
tensor ops over [B, H, W, C] images and [B, K, 3] keypoints.

Random draws mirror the reference distributions:
  * flip:    Bernoulli(prob) per sample
  * noise:   Bernoulli(prob); contrast U(0.8, 1.2) about the mean,
             brightness U(-0.2, 0.2), clamp to [0, 1]
  * affine:  scale *= clamp(N(1, sf), 1-sf, 1+sf);
             angle = clamp(N(0, rf), -rf, rf)
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .transforms import (affine_warp_matrix, affine_warpmat, fliplr_images,
                         fliplr_kps, transform_points, warp_images_affine)


class AugmentedBatch(NamedTuple):
    images: jnp.ndarray     # [B, H, W, C] augmented (pre color-norm)
    kps: jnp.ndarray        # [B, K, 3] transformed keypoints
    center: jnp.ndarray     # [B, 2] post-flip centers
    scale: jnp.ndarray      # [B] drawn scales
    angle: jnp.ndarray      # [B] drawn angles (degrees)
    isflip: jnp.ndarray     # [B] bool
    warpmat: jnp.ndarray    # [B, 2, 3] inverse warp (for affine_back)


def random_flip(rng, images, kps, center, prob=0.5):
    """Batched reference fliplr: image mirror, x -> W - x, center mirrored."""
    B = images.shape[0]
    W = images.shape[2]
    flip = jax.random.uniform(rng, (B,)) <= prob
    fmask = flip[:, None, None, None]
    images = jnp.where(fmask, fliplr_images(images), images)
    kps_f = fliplr_kps(kps, W)
    kps = jnp.where(flip[:, None, None], kps_f, kps)
    center = jnp.where(flip[:, None],
                       center.at[:, 0].set(W - center[:, 0]), center)
    return images, kps, center, flip


def noisy_mean(rng, images, prob=0.5):
    """Batched reference noisy_mean: random contrast about the image mean
    plus random brightness, applied with probability `prob` per sample."""
    B = images.shape[0]
    r_apply, r_con, r_bri = jax.random.split(rng, 3)
    apply = (jax.random.uniform(r_apply, (B,)) <= prob).astype(images.dtype)
    con = jax.random.uniform(r_con, (B,), minval=0.8, maxval=1.2)
    bri = jax.random.uniform(r_bri, (B,), minval=-0.2, maxval=0.2)
    mu = jnp.mean(images, axis=(1, 2, 3))
    con_ = con[:, None, None, None].astype(images.dtype)
    bri_ = bri[:, None, None, None].astype(images.dtype)
    mu_ = mu[:, None, None, None]
    noised = jnp.clip(con_ * (images - mu_) + mu_ + bri_, 0.0, 1.0)
    a = apply[:, None, None, None]
    return a * noised + (1 - a) * images


def sample_affine_params(rng, base_scale, sf, rf):
    """Draw per-sample scale/angle exactly as reference AugmentUtils.affine."""
    B = base_scale.shape[0]
    r_s, r_a = jax.random.split(rng)
    s_draw = jnp.clip(jax.random.normal(r_s, (B,)) * sf + 1.0, 1.0 - sf, 1.0 + sf)
    scale = base_scale * s_draw
    angle = jnp.clip(jax.random.normal(r_a, (B,)) * rf, -rf, rf)
    return scale, angle


def affine_batch(images, kps, center, scale, angle, inp_res):
    """Apply the MPII crop/rotate warp to a batch; transform kps to match.

    Keypoints follow reference affine_kps: only points with y > 0 are
    transformed (others pass through); outputs are integer-truncated + 1.
    """
    mat = affine_warp_matrix(center, scale, angle, (inp_res, inp_res))
    images = warp_images_affine(images, mat.astype(images.dtype), inp_res)
    pts = transform_points(kps[..., 0:2], center[:, None, :], scale[:, None],
                           (inp_res, inp_res), invert=False,
                           rot=angle[:, None]).astype(kps.dtype)
    movable = (kps[..., 1] > 0)[..., None]
    new_xy = jnp.where(movable, pts, kps[..., 0:2])
    kps = jnp.concatenate([new_xy, kps[..., 2:3]], axis=-1)
    return images, kps


def augment_batch(rng, images, kps, center, base_scale, *, inp_res=256,
                  use_flip=True, sf=0.25, rf=30.0, flip_prob=0.5,
                  noise_prob=0.5):
    """Full reference augmentation chain: flip -> noise -> affine.

    images: [B, H, W, C] in [0, 1]; kps: [B, K, 3]; center: [B, 2] float;
    base_scale: [B] (inp_res / 200 convention).
    """
    B = images.shape[0]
    r_flip, r_noise, r_aff = jax.random.split(rng, 3)
    if use_flip:
        images, kps, center, isflip = random_flip(r_flip, images, kps, center,
                                                  prob=flip_prob)
    else:
        isflip = jnp.zeros((B,), dtype=bool)
    images = noisy_mean(r_noise, images, prob=noise_prob)
    scale, angle = sample_affine_params(r_aff, base_scale, sf, rf)
    images, kps = affine_batch(images, kps, center, scale, angle, inp_res)
    # affine_warpmat already folds the dataset's (-angle, 1/scale) call
    warpmat = affine_warpmat(angle, scale)
    return AugmentedBatch(images, kps, center, scale, angle, isflip, warpmat)


def color_normalize(images, means):
    """Reference image_colorNorm: channel mean subtraction only (useStd=False)."""
    return images - jnp.asarray(means, images.dtype)[None, None, None, :]


def composite_occluders(rng, images, occluder_bank, occluder_alpha,
                        num_occluders, scale_range=(0.2, 0.7), aug_rate=0.5):
    """Synthetic-occlusion augmentation (reference utils/udaap/utils_augment.py).

    Alpha-pastes `num_occluders` randomly-scaled/positioned occluder patches
    onto each image.  The occluder bank is a pre-harvested device tensor
    [Nbank, h, w, C] with matching alpha [Nbank, h, w]; harvesting from
    VOC2012 happens offline (data/occluders.py).
    """
    B, H, W, C = images.shape
    nbank, oh, ow = occluder_bank.shape[0], occluder_bank.shape[1], occluder_bank.shape[2]

    def paste_one(img, r):
        def body(i, state):
            img, r = state
            r, r_pick, r_scale, r_pos = jax.random.split(r, 4)
            pick = jax.random.randint(r_pick, (), 0, nbank)
            occ = occluder_bank[pick]
            alpha = occluder_alpha[pick]
            s = jax.random.uniform(r_scale, (), minval=scale_range[0],
                                   maxval=scale_range[1])
            # scaled sample of the occluder onto a HxW canvas at random pos
            cx = jax.random.uniform(r_pos, (2,), minval=0.1, maxval=0.9)
            ys = (jnp.arange(H) - cx[1] * H) / (s * H) * oh + oh / 2
            xs = (jnp.arange(W) - cx[0] * W) / (s * W) * ow + ow / 2
            yi = jnp.clip(ys.astype(jnp.int32), 0, oh - 1)
            xi = jnp.clip(xs.astype(jnp.int32), 0, ow - 1)
            inb = ((ys >= 0) & (ys < oh))[:, None] * ((xs >= 0) & (xs < ow))[None, :]
            a = alpha[yi][:, xi] * inb
            patch = occ[yi][:, xi]
            img = img * (1 - a[..., None]) + patch * a[..., None]
            return img, r

        img, _ = jax.lax.fori_loop(0, num_occluders, body, (img, r))
        return img

    r_apply, r_paste = jax.random.split(rng)
    apply = (jax.random.uniform(r_apply, (B,)) <
             aug_rate)[:, None, None, None].astype(images.dtype)
    rngs = jax.random.split(r_paste, B)
    pasted = jax.vmap(paste_one)(images, rngs)
    return apply * pasted + (1 - apply) * images
