"""Shared training-pipeline pieces: device-resident dataset, in-step
augmentation + target synthesis, validation step.

The design inverts the reference's host-side per-sample Dataset
(datasets/dataset.py:21-146): the whole dataset lives in device HBM as uint8;
each compiled step gathers its batch by index and runs flip/noise/affine/
Gaussian-synthesis as batched XLA ops — no host round trips.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import augment as A
from ..ops import heatmap as HM
from ..ops import pck as PCK


class DeviceDataset(NamedTuple):
    images: jnp.ndarray     # [N, R, R, 3] uint8 (BGR)
    kps: jnp.ndarray        # [N, K, 3] float32 (inp_res coords)
    kps_test: jnp.ndarray   # [N, K, 3]
    islabeled: jnp.ndarray  # [N] int32
    means: jnp.ndarray      # [3]


def put_dataset(arrays, means, sharding=None) -> DeviceDataset:
    """Place the dataset in HBM; `sharding` (a NamedSharding over the 'data'
    mesh axis) splits the sample axis across chips, means stay replicated."""
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        put = lambda x: jax.device_put(x, sharding)
        put_repl = lambda x: jax.device_put(
            x, NamedSharding(sharding.mesh, P()))
    else:
        put = put_repl = jax.device_put
    return DeviceDataset(
        images=put(np.asarray(arrays.images)),
        kps=put(np.asarray(arrays.kps)),
        kps_test=put(np.asarray(arrays.kps_test)),
        islabeled=put(np.asarray(arrays.islabeled)),
        means=put_repl(np.asarray(means, np.float32)),
    )


class ViewBatch(NamedTuple):
    """One augmented view ready for the model + losses."""
    images: jnp.ndarray    # [B, R, R, 3] float32, color-normalized
    heatmaps: jnp.ndarray  # [B, H, W, K]
    kps: jnp.ndarray       # [B, K, 3] post-augment (vis re-gated)
    gate: jnp.ndarray      # [B, K] visibility gate
    warpmat: jnp.ndarray   # [B, 2, 3]
    isflip: jnp.ndarray    # [B]
    center: jnp.ndarray    # [B, 2]
    scale: jnp.ndarray     # [B]
    angle: jnp.ndarray     # [B]


def make_view(rng, images_u8, kps, means, cfg, *, augment=True,
              scale_range=None, rot_range=None, occluder_bank=None,
              use_occlusion=None):
    """Build one (optionally augmented) view entirely on device.

    Mirrors CommDataset.__getitem__ steps 2-5: load -> (flip, noise, affine,
    occlusion) -> colorNorm -> heatmap synth (+ vis re-gate) -> warpmat.
    """
    B = images_u8.shape[0]
    inp = cfg.inp_res
    imgs = images_u8.astype(jnp.float32) / 255.0
    center = jnp.full((B, 2), inp // 2, jnp.float32)
    base_scale = jnp.full((B,), inp / 200.0, jnp.float32)
    if augment:
        rng, r_occ = jax.random.split(rng)
        aug = A.augment_batch(
            rng, imgs, kps, center, base_scale, inp_res=inp,
            use_flip=cfg.use_flip,
            sf=cfg.scale_range if scale_range is None else scale_range,
            rf=cfg.rot_range if rot_range is None else rot_range)
        imgs, kps, center = aug.images, aug.kps, aug.center
        scale, angle, isflip, warpmat = (aug.scale, aug.angle, aug.isflip,
                                         aug.warpmat)
        occ_on = cfg.use_occlusion if use_occlusion is None else use_occlusion
        if occ_on and occluder_bank is not None:
            occ_rgb, occ_alpha = occluder_bank
            imgs = A.composite_occluders(r_occ, imgs, occ_rgb, occ_alpha,
                                         cfg.num_occluder)
    else:
        scale = base_scale
        angle = jnp.zeros((B,), jnp.float32)
        isflip = jnp.zeros((B,), bool)
        warpmat = jnp.tile(jnp.eye(2, 3, dtype=jnp.float32), (B, 1, 1))
    imgs = A.color_normalize(imgs, means)
    if jax.default_backend() == "tpu":
        from ..ops.pallas import synthesize_heatmaps_pallas
        heatmaps, kps_new = synthesize_heatmaps_pallas(kps, inp_res=inp,
                                                       out_res=cfg.out_res)
    else:
        heatmaps, kps_new = HM.synthesize_heatmaps(kps, inp_res=inp,
                                                   out_res=cfg.out_res)
    gate = kps_new[..., 2]
    return ViewBatch(imgs, heatmaps, kps_new, gate, warpmat, isflip,
                     center, scale, angle)


def make_class_view(rng, images_u8, means, cfg, *, augment=True):
    """Classification view (reference datasets/classification/dataset.py):
    flip -> noise -> affine (no keypoints) -> colorNorm, on 32x32 images."""
    B = images_u8.shape[0]
    inp = cfg.inp_res
    imgs = images_u8.astype(jnp.float32) / 255.0
    center = jnp.full((B, 2), inp // 2, jnp.float32)
    base_scale = jnp.full((B,), inp / 200.0, jnp.float32)
    if augment:
        dummy_kps = jnp.zeros((B, 1, 3), jnp.float32)
        aug = A.augment_batch(rng, imgs, dummy_kps, center, base_scale,
                              inp_res=inp, use_flip=cfg.use_flip,
                              sf=cfg.scale_range, rf=cfg.rot_range)
        imgs = aug.images
    imgs = A.color_normalize(imgs, means)
    return imgs


def forward_heatmaps(model, params, batch_stats, images, train, compute_dtype,
                     remat=False):
    """Apply a pose model; returns ((preds, feats_or_None), new_batch_stats).

    remat=True (Config.remat) wraps the training forward in jax.checkpoint:
    the backward pass recomputes activations instead of keeping them live,
    trading ~one extra forward of FLOPs for a large cut in activation HBM —
    the standard TPU lever for batch sizes that are memory- rather than
    compute-bound (identical math; see tests/test_step_exec.py)."""
    x = images.astype(compute_dtype) if compute_dtype is not None else images
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        def apply_train(p, b, xx):
            out, mut = model.apply({"params": p, "batch_stats": b}, xx,
                                   train=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        if remat:
            apply_train = jax.checkpoint(apply_train)
        out, new_bs = apply_train(params, batch_stats, x)
    else:
        out = model.apply(variables, x, train=False)
        new_bs = batch_stats
    if isinstance(out, tuple):
        preds, feats = out
    else:
        preds, feats = out, None
    preds = preds.astype(jnp.float32)
    if feats is not None:
        feats = feats.astype(jnp.float32)
    return (preds, feats), new_bs


def build_validate_step(model, cfg, means, compute_dtype=None):
    """Jitted eval step: normalize -> forward -> decode last stack -> PCK.

    Matches the reference validation path (projects/supervised.py:178-211):
    center = image center, scale = inp_res/200, decode reference
    utils/process.py:320-327, PCK utils/evaluation.py:92-115.
    """
    means_arr = jnp.asarray(means, jnp.float32)
    pck_ref = tuple(int(i) for i in cfg.pck_ref)
    pck_thr = float(cfg.pck_thr)

    @jax.jit
    def validate_step(params, batch_stats, images_u8, kps):
        B = images_u8.shape[0]
        imgs = images_u8.astype(jnp.float32) / 255.0
        imgs = A.color_normalize(imgs, means_arr)
        (preds, _), _ = forward_heatmaps(model, params, batch_stats, imgs,
                                         False, compute_dtype)
        last = preds[:, -1]  # [B, H, W, K]
        center = jnp.full((B, 2), cfg.inp_res // 2, jnp.float32)
        scale = jnp.full((B,), cfg.inp_res / 200.0, jnp.float32)
        coords, scores = HM.decode_heatmaps(last, center, scale,
                                            res=(cfg.out_res, cfg.out_res))
        errs, accs = PCK.acc_pck(coords, kps, pck_ref, pck_thr)
        return coords, scores, errs, accs

    return validate_step


def update_pck_counters(acc_counters, err_counters, accs, errs, bs, k):
    """Reference per-batch counter weighting (projects/supervised.py:202-205)."""
    for idx in range(k + 1):
        n = bs if idx < k else bs * k
        acc_counters.update(idx, float(accs[idx]), n)
        err_counters.update(idx, float(errs[idx]), n)
