"""Gaussian heatmap synthesis and argmax decode as batched XLA ops.

Replaces the reference's hot per-sample host loops with fully vectorized
device kernels:

  - kps_heatmap (synthesis + visibility gating)  reference utils/process.py:252-318
  - get_preds (argmax -> 1-indexed coords)       reference utils/udaap/evaluation.py:13-30
  - final_preds (decode to image coords)         reference utils/udaap/evaluation.py:215-238
  - kps_fromHeatmap (decode + scores)            reference utils/process.py:320-336

Layout: heatmaps are channel-last [..., H, W, K]; keypoints are [..., K, 3]
(x, y, vis) in input-resolution coordinates.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .transforms import transform_preds


@partial(jax.jit, static_argnames=("inp_res", "out_res", "kernel_size", "sigma"))
def synthesize_heatmaps(kps, inp_res=256, out_res=64, kernel_size=3.0, sigma=1.0):
    """Batched Gaussian target synthesis with visibility gating.

    kps: [..., K, 3] float (x, y, vis) in inp_res coords.
    Returns (heatmaps [..., H, W, K], kps_new [..., K, 3]) where kps_new has
    vis zeroed for joints whose +-sigma box leaves the frame — the reference
    *mutates* visibility here (utils/process.py:263-267) and that gate feeds
    the loss, so it must be returned.

    Semantics notes (kept bit-compatible with the reference):
      * the Gaussian center is trunc(x)/stride (integer truncation);
      * the kernel is synthesized for every joint regardless of visibility;
      * values < 0.01 are clamped to 0.
    """
    stride = inp_res / out_res
    sig = sigma * kernel_size
    x = kps[..., 0]
    y = kps[..., 1]
    vis = kps[..., 2]

    xi = jnp.trunc(x)  # torch .to(int32) truncates toward zero
    yi = jnp.trunc(y)
    # box check in input space: ul = int(xi - sig) < 0 or br = int(xi + sig + 1) >= res
    in_bounds = ((xi + sig + 1 < inp_res) & (yi + sig + 1 < inp_res)
                 & (xi - sig >= 0) & (yi - sig >= 0))
    vis_new = vis * in_bounds.astype(vis.dtype)
    kps_new = jnp.stack([x, y, vis_new], axis=-1)

    cx = xi / stride  # [..., K]
    cy = yi / stride
    grid = jnp.arange(out_res, dtype=kps.dtype)
    # D2[..., h, w, k] = (w - cx)^2 + (h - cy)^2
    dx2 = (grid[:, None] - cx[..., None, :]) ** 2          # [..., W? -> w, K]
    dy2 = (grid[:, None] - cy[..., None, :]) ** 2          # [..., h, K]
    d2 = dy2[..., :, None, :] + dx2[..., None, :, :]       # [..., H, W, K]
    kern = jnp.exp(-d2 / (2.0 * sig * sig))
    kern = jnp.where(kern < 0.01, 0.0, jnp.minimum(kern, 1.0))
    return kern, kps_new


def get_preds(heatmaps):
    """Argmax decode to 1-indexed (x, y); confidence-masked.

    heatmaps: [B, H, W, K].  Returns float [B, K, 2] — matches reference
    get_preds on the [B, K, H, W] layout (row-major flatten over H*W,
    first-max-wins, coords zeroed where max <= 0).
    """
    B, H, W, K = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, K)
    idx = jnp.argmax(flat, axis=1)               # [B, K] first occurrence
    maxval = jnp.max(flat, axis=1)               # [B, K]
    p = (idx + 1).astype(heatmaps.dtype)
    xs = jnp.mod(p - 1, W) + 1
    ys = jnp.floor((p - 1) / W) + 1
    preds = jnp.stack([xs, ys], axis=-1)
    mask = (maxval > 0).astype(heatmaps.dtype)[..., None]
    return preds * mask


@partial(jax.jit, static_argnames=("res",))
def decode_heatmaps(heatmaps, center, scale, res=(64, 64)):
    """Reference kps_fromHeatmap(mode="batch"): decode + per-map max scores.

    heatmaps: [B, H, W, K]; center: [B, 2]; scale: [B].
    Returns (preds [B, K, 2] in original image coords, scores [B, K]).
    """
    preds = get_preds(heatmaps)
    preds = transform_preds(preds, center, scale, res)
    scores = jnp.max(heatmaps, axis=(1, 2))
    return preds, scores


def get_preds_all(heatmaps):
    """Reference get_preds_all: argmax decode WITHOUT the confidence mask."""
    B, H, W, K = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, K)
    p = (jnp.argmax(flat, axis=1) + 1).astype(heatmaps.dtype)
    xs = jnp.mod(p - 1, W) + 1
    ys = jnp.floor((p - 1) / W) + 1
    return jnp.stack([xs, ys], axis=-1)


def refine_quarter_pixel(heatmaps, preds):
    """Quarter-pixel refinement (reference kps_fromHeatmap2 / the
    commented-out block in final_preds, utils/udaap/evaluation.py:218-228):
    nudge each argmax by +-0.25 toward the larger neighbor, then +0.5.

    heatmaps: [B, H, W, K]; preds: [B, K, 2] 1-indexed coords.
    """
    B, H, W, K = heatmaps.shape
    px = preds[..., 0].astype(jnp.int32)   # 1-indexed
    py = preds[..., 1].astype(jnp.int32)

    def at(y, x):
        yc = jnp.clip(y, 0, H - 1)
        xc = jnp.clip(x, 0, W - 1)
        flat = jnp.moveaxis(heatmaps, -1, 1).reshape(B, K, H * W)
        idx = yc * W + xc
        return jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]

    # reference indexing: hm[py-1][px] - hm[py-1][px-2], etc (0-indexed grid)
    dx = at(py - 1, px) - at(py - 1, px - 2)
    dy = at(py, px - 1) - at(py - 2, px - 1)
    valid = (px > 1) & (px < W) & (py > 1) & (py < H)
    shift = jnp.stack([jnp.sign(dx), jnp.sign(dy)], -1) * 0.25
    refined = preds + shift * valid[..., None].astype(preds.dtype)
    return refined + 0.5


@partial(jax.jit, static_argnames=("res",))
def decode_heatmaps_mul(multi_heatmaps, center, scale, res=(64, 64)):
    """Reference kps_fromHeatmap_mul: decode M models' heatmaps + their mean.

    multi_heatmaps: [M, B, H, W, K].
    Returns (preds_multi [M, B, K, 2], preds_mean, scores_multi [M, B, K],
    scores_mean).
    """
    preds_multi, scores_multi = jax.vmap(
        lambda hm: decode_heatmaps(hm, center, scale, res))(multi_heatmaps)
    return (preds_multi, jnp.mean(preds_multi, axis=0),
            scores_multi, jnp.mean(scores_multi, axis=0))
