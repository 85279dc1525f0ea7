"""Inference / serving API.

The reference has no inference path beyond validation inside the trainers;
for deployment this module provides:

  * PoseEstimator: checkpoint -> jitted (images -> keypoints, scores) with
    fixed-shape batching (pad-and-mask) so every request hits a cached
    executable
  * ensemble mode: average the decoded coordinates of several heads
    (the MT_UBPL "mean" row)

Usage:
    est = PoseEstimator.from_checkpoint("experiments/run", model="HG3",
                                        kps_count=9)
    kps, scores = est.predict(images_u8)   # [N,256,256,3] BGR uint8
"""
import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .models import create_pose_model, init_model
from .ops import augment as A
from .ops import heatmap as HM


class PoseEstimator:
    def __init__(self, model, params, batch_stats, means, cfg: Config,
                 batch_size: int = 32):
        from .utils.xla_cache import enable_compilation_cache
        enable_compilation_cache()
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.cfg = cfg
        self.batch_size = batch_size
        self.means = jnp.asarray(means, jnp.float32)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        def predict_fn(params, batch_stats, images_u8):
            B = images_u8.shape[0]
            imgs = A.color_normalize(images_u8.astype(jnp.float32) / 255.0,
                                     self.means)
            x = imgs.astype(dtype) if dtype is not None else imgs
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              x, train=False)
            preds = out[0] if isinstance(out, tuple) else out
            last = preds.astype(jnp.float32)[:, -1]
            center = jnp.full((B, 2), cfg.inp_res // 2, jnp.float32)
            scale = jnp.full((B,), cfg.inp_res / 200.0, jnp.float32)
            return HM.decode_heatmaps(last, center, scale,
                                      res=(cfg.out_res, cfg.out_res))

        self._predict = jax.jit(predict_fn)

    @classmethod
    def from_checkpoint(cls, base_path, model="HG3", kps_count=9,
                        feature_mode="AvgPool", means=(0., 0., 0.),
                        head: Optional[str] = "ema", branch: int = 0,
                        best=True, **cfg_kw):
        """Load a trainer checkpoint (any regime).  head: "ema" prefers the
        teacher params when present; branch selects the ensemble member."""
        from .train.checkpointing import restore_checkpoint
        cfg = Config(model=model, feature_mode=feature_mode, **cfg_kw)
        cfg.kps_count = kps_count
        net = create_pose_model(model, kps_count, feature_mode,
                                dtype=jnp.bfloat16
                                if cfg.compute_dtype == "bfloat16" else None)
        restored, meta = restore_checkpoint(base_path, best=best)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {base_path}")
        key = ("ema_params" if head == "ema" and "ema_params" in restored
               else "params")
        bs_key = ("ema_batch_stats" if key == "ema_params" else "batch_stats")
        params = restored[key]
        batch_stats = restored[bs_key]
        leaves = jax.tree_util.tree_leaves(params)
        sample = jnp.zeros((1, cfg.inp_res, cfg.inp_res, 3))
        ref_params, _ = init_model(net, jax.random.PRNGKey(0), sample)
        if leaves and leaves[0].ndim > jax.tree_util.tree_leaves(
                ref_params)[0].ndim:
            # stacked dual-branch state: select one branch
            params = jax.tree_util.tree_map(lambda t: t[branch], params)
            batch_stats = jax.tree_util.tree_map(lambda t: t[branch],
                                                 batch_stats)
        return cls(net, params, batch_stats, means, cfg)

    @classmethod
    def from_torch_checkpoint(cls, path, model="HG3", kps_count=9,
                              feature_mode="AvgPool", means=(0., 0., 0.),
                              head="ema", branch: int = 1, **cfg_kw):
        """Serve a REFERENCE-trained checkpoint (ckpts/checkpoint[_best]
        .pth.tar from any reference regime) directly: the torch state_dict
        is imported into the flax hourglass (models/torch_import.py).
        branch: 1 or 2 for the dual-network regimes; head="ema" uses the
        EMA teacher (what the reference validates and selects on)."""
        from .models.torch_import import load_reference_checkpoint
        n_stack = int(model[2:]) if model.startswith("HG") else 3
        params, batch_stats, _ = load_reference_checkpoint(
            path, n_stack=n_stack, mode=feature_mode, branch=branch,
            head=head)
        cfg = Config(model=model, feature_mode=feature_mode, **cfg_kw)
        cfg.kps_count = kps_count
        net = create_pose_model(model, kps_count, feature_mode,
                                dtype=jnp.bfloat16
                                if cfg.compute_dtype == "bfloat16" else None)
        return cls(net, params, batch_stats, means, cfg)

    def _chunks(self, images_u8):
        bs = self.batch_size
        for i in range(0, images_u8.shape[0], bs):
            chunk = images_u8[i:i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            yield chunk, bs - pad

    def predict(self, images_u8):
        """images_u8: numpy [N, inp_res, inp_res, 3] BGR uint8.
        Returns (kps [N, K, 2] image coords, scores [N, K]).

        Multi-chunk requests are double-buffered: chunk i+1's host->device
        transfer is issued (asynchronously) before blocking on chunk i's
        results, so transfer and compute overlap — on hosts where the PCIe
        link is the bottleneck this hides most of the compute time."""
        images_u8 = np.asarray(images_u8)
        if images_u8.shape[0] == 0:
            K = self.cfg.kps_count
            return (np.zeros((0, K, 2), np.float32),
                    np.zeros((0, K), np.float32))
        kps_out, scores_out = [], []
        pending = None         # (device_chunk, n_valid)
        chunks = itertools.chain(self._chunks(images_u8), (None,))
        for item in chunks:    # trailing sentinel drains the last chunk
            staged = (None if item is None
                      else (jax.device_put(item[0]), item[1]))
            if pending is not None:
                coords, scores = self._predict(self.params, self.batch_stats,
                                               pending[0])
                kps_out.append(np.asarray(coords)[:pending[1]])
                scores_out.append(np.asarray(scores)[:pending[1]])
            pending = staged
        return np.concatenate(kps_out), np.concatenate(scores_out)
