"""Offline UBPL pseudo-label selection loop.

The reference ships the machinery for this workflow (utils/business.py +
dataset.update()) but never wires it into a trainer; this module closes the
loop for the dual-teacher regimes:

  1. run both teachers on every unlabeled sample — the original view plus
     `aug_views` independently-augmented views whose heatmaps are warped
     back to the original frame (affine_back + scale=1 decode, the
     reference's test_affine_back convention);
  2. score each keypoint: intDist (per-teacher spread over views), extDist
     (inter-teacher distance), intDist-weighted ensemble coordinate
     (business.py:108-161), optional LMA smoothing over selection rounds,
     mixed uncertainty 1-exp(-mixDist/5);
  3. select by reliability quantile (filter_pseudo) and inject the chosen
     pseudo keypoints into the training arrays (dataset.update), auditing
     selection quality against the retained ground truth (kps_test);
  4. refresh the trainer's device dataset (steps are rebuilt since the
     compiled step closes over the data arrays).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import heatmap as HM
from ..ops import transforms as T
from . import pseudo as P
from .common import make_view


class PseudoLabelingLoop:
    def __init__(self, trainer, aug_views=2, reliable_pct=0.5,
                 reliable_thr=0.2, dist_thr_max=20.0, use_lma=True,
                 batch_size=32):
        self.trainer = trainer
        self.aug_views = aug_views
        self.reliable_pct = reliable_pct
        self.reliable_thr = reliable_thr
        self.dist_thr_max = dist_thr_max
        self.batch_size = batch_size
        cfg = trainer.cfg
        n_unl = len(trainer.unlabeled_idxs)
        self.lma_int = [P.LMACache((n_unl, cfg.kps_count)) for _ in range(2)] \
            if use_lma else None
        self.lma_ext = P.LMACache((n_unl, cfg.kps_count)) if use_lma else None
        # pristine copies: each apply RESETS then injects, like the
        # reference's dataArray_reset (datasets/dataset_mds.py:15-16)
        self._kps0 = np.array(trainer.train_data.kps)
        self._islabeled0 = np.array(trainer.train_data.islabeled)
        self._build_infer()

    def _build_infer(self):
        tr = self.trainer
        cfg = tr.cfg
        model = tr.model
        dtype = tr.compute_dtype
        means = tr.means

        def infer(params_m, bs_m, images_u8, kps, rng, augment):
            """Teacher predictions in ORIGINAL-frame coords [M, B, K, 2]."""
            B = images_u8.shape[0]
            view = make_view(rng, images_u8, kps, means, cfg, augment=augment)

            def fwd(p, b):
                from .common import forward_heatmaps
                (preds, _), _ = forward_heatmaps(model, p, b, view.images,
                                                 False, dtype)
                return preds[:, -1]

            last = jax.vmap(fwd)(params_m, bs_m)      # [M, B, H, W, K]
            back = jax.vmap(lambda hm: T.affine_back(hm, view.warpmat,
                                                     view.isflip))(last)
            center = jnp.full((B, 2), cfg.inp_res // 2, jnp.float32)
            coords, _, scores, _ = HM.decode_heatmaps_mul(
                back, center, jnp.ones((B,)), (cfg.out_res, cfg.out_res))
            return coords, scores

        self._infer = jax.jit(infer, static_argnames=("augment",))

    def _predict_all(self, rng):
        tr = self.trainer
        idxs = np.asarray(tr.unlabeled_idxs)
        M = tr.n_models
        K = tr.cfg.kps_count
        N = len(idxs)
        ori = np.zeros((M, N, K, 2))
        augs = np.zeros((self.aug_views, M, N, K, 2))
        for lo in range(0, N, self.batch_size):
            sel = idxs[lo:lo + self.batch_size]
            imgs = tr.train_data.images[jnp.asarray(sel)]
            kps = tr.train_data.kps_test[jnp.asarray(sel)]
            c, _ = self._infer(tr.state.ema_params, tr.state.ema_batch_stats,
                               imgs, kps, jax.random.fold_in(rng, lo),
                               augment=False)
            ori[:, lo:lo + len(sel)] = np.asarray(c)
            for a in range(self.aug_views):
                c, _ = self._infer(tr.state.ema_params,
                                   tr.state.ema_batch_stats, imgs, kps,
                                   jax.random.fold_in(rng, lo * 131 + a + 1),
                                   augment=True)
                augs[a, :, lo:lo + len(sel)] = np.asarray(c)
        return ori, augs

    def round(self, rng, apply=True):
        """One selection round; returns (Selection, EnsembleAssessment)."""
        tr = self.trainer
        cfg = tr.cfg
        idxs = np.asarray(tr.unlabeled_idxs)
        gts = np.asarray(tr.train_data.kps_test)[idxs]   # retained truth
        ori, augs = self._predict_all(rng)
        ens = P.assess_ensemble(ori[0], ori[1], augs[:, 0], augs[:, 1], gts,
                                tuple(cfg.pck_ref), cfg.pck_thr)
        ext = ens.ext_dist
        if self.lma_ext is not None:
            int1 = self.lma_int[0].update(ens.int_dist1)
            int2 = self.lma_int[1].update(ens.int_dist2)
            ext = self.lma_ext.update(ens.ext_dist)
            unc, _ = P.mixed_uncertainty((int1 + int2) / 2, ext, ext,
                                         self.dist_thr_max)
            rel = 1.0 - np.clip(unc, 0.0, 1.0)
            rel = np.where(ens.legal > 0, rel, 0.0)
        else:
            rel = P.reliability_from_dist(ext, ens.legal,
                                          reliable_dist_min=1.0)
        sel = P.select_pseudo(rel, ens.errors, ens.acc_flags,
                              self.reliable_pct, self.reliable_thr)
        if apply and sel.sel_counts[-1] > 0:
            self._apply(idxs, ens.coords, sel.enable)
        return sel, ens

    def _apply(self, sample_idxs, coords, enable):
        """dataset.update() semantics (datasets/dataset_mds.py:14-25): reset
        to the pristine arrays, inject enabled pseudo kps with vis=1, and
        flip the sample into the labeled pool (islabeled=1) so the 'pos'
        sample weights apply the PEC loss to it; refresh device data + steps.
        Sampler index lists stay fixed, as in the reference (the loader is
        never rebuilt there)."""
        tr = self.trainer
        kps = self._kps0.copy()
        islabeled = self._islabeled0.copy()
        for row, c, e in zip(sample_idxs, coords, enable):
            m = e > 0
            if m.any():
                kps[row, m, 0:2] = c[m]
                kps[row, m, 2] = 1.0
                islabeled[row] = 1
        sharding = tr.train_data.kps.sharding
        tr.train_data = tr.train_data._replace(
            kps=jax.device_put(kps, sharding),
            islabeled=jax.device_put(islabeled,
                                     tr.train_data.islabeled.sharding))
        tr._build_steps()  # steps close over the device arrays
