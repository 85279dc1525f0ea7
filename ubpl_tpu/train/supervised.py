"""Supervised baseline trainer (reference projects/supervised.py).

Labeled-only heatmap regression: AdamW(lr 2.5e-4, wd 0), JointMSELoss x
poseWeight, PCK model selection.  The whole per-batch pipeline — batch
gather, flip/noise/affine augmentation, Gaussian target synthesis, forward,
loss, backward, optimizer — is ONE jitted step with donated state.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import supervised_epoch_batches
from .base_trainer import BaseTrainer
from .common import build_validate_step, forward_heatmaps, make_view
from . import losses as L


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: tuple


class SupervisedTrainer(BaseTrainer):
    regime = "Supervised"
    valid_heads = ("model",)

    def _setup_model(self):
        cfg = self.cfg
        self.model = self._make_model()
        params, batch_stats = self._init_n(self.model, None)
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.wd)
        tx = self.tx
        self.state = self._jit_build_state(
            lambda p, b: TrainState(p, b, tx.init(p)), params, batch_stats)
        self._log_model_init(params, "Supervised")

    def _build_steps(self):
        cfg = self.cfg
        model, tx = self.model, self.tx
        data = self.train_data
        means = self.means
        dtype = self.compute_dtype
        base_key = jax.random.PRNGKey(cfg.seed)
        pose_weight = float(cfg.pose_weight)

        def step(state: TrainState, idxs, step_num):
            rng = jax.random.fold_in(base_key, step_num)
            imgs, kps, _ = self.fetch_batch(data, idxs)
            view = make_view(rng, imgs, kps, means, cfg, augment=True)

            def loss_fn(params):
                (preds, _), new_bs = forward_heatmaps(
                    model, params, state.batch_stats, view.images, True, dtype,
                    remat=cfg.remat)
                s, n = L.joint_mse(preds, view.heatmaps)
                loss = pose_weight * jnp.where(n > 0, s / jnp.maximum(n, 1), s)
                return loss, (new_bs, n)

            (loss, (new_bs, n)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, new_bs, new_opt), {"pec_loss": loss,
                                                         "pec_count": n}

        self.compile_train_step(step)
        self.validate_step = build_validate_step(
            model, cfg, np.asarray(self.means), dtype)

    def epoch_schedules(self, epo):
        return {}

    def train_epoch(self, epo, schedules=None):
        cfg = self.cfg
        pec_counter = L.AvgCounter()
        metrics = self.run_train_steps(
            supervised_epoch_batches(self.labeled_idxs, cfg.train_bs,
                                     self.rng))
        for m in metrics:
            pec_counter.update(float(m["pec_loss"]), int(m["pec_count"]))
        return {"pec_loss": pec_counter.avg}

    def validate(self):
        cfg = self.cfg
        from ..data import valid_batches
        from .common import update_pck_counters
        acc_c, err_c = L.AvgCounters(), L.AvgCounters()
        preds_array = []
        k = cfg.kps_count
        for idxs in valid_batches(self.n_valid, cfg.infer_bs):
            imgs = self.valid_data.images[jnp.asarray(idxs)]
            kps = self.valid_data.kps[jnp.asarray(idxs)]
            coords, scores, errs, accs = self.validate_step(
                self.state.params, self.state.batch_stats, imgs, kps)
            preds_array += np.asarray(coords).tolist()
            update_pck_counters(acc_c, err_c, np.asarray(accs),
                                np.asarray(errs), len(idxs), k)
        return [preds_array], [acc_c.avg()], [err_c.avg()]

    def format_epoch_log(self, losses, accs, errs):
        return "pec_loss: {:.5f} | acc: {:.5f}, err: {:.3f}".format(
            losses["pec_loss"], accs[0][-1], errs[0][-1])


def exec_regime(exp_mark="Supervised", params=None):
    from .base_trainer import run_regime
    return run_regime(SupervisedTrainer, exp_mark, params)
