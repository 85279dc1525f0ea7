"""Supervised baseline trainer (reference projects/supervised.py).

Labeled-only heatmap regression: AdamW(lr 2.5e-4, wd 0), JointMSELoss x
poseWeight, PCK model selection.  The whole per-batch pipeline — batch
gather, flip/noise/affine augmentation, Gaussian target synthesis, forward,
loss, backward, optimizer — is ONE jitted step with donated state.
"""
import datetime
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data import get_datasource, materialize, supervised_epoch_batches, valid_batches
from ..models import create_pose_model, init_model, param_count
from ..utils import Logger, json_save
from . import losses as L
from .common import (DeviceDataset, build_validate_step, forward_heatmaps,
                     make_view, put_dataset, update_pck_counters)


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: tuple


class SupervisedTrainer:
    regime = "Supervised"

    def __init__(self, cfg: Config, logger=None):
        self.cfg = cfg
        self.logger = logger or Logger(cfg.data_source + "_" + self.regime)
        self._setup_data()
        self._setup_model()
        self._build_steps()
        self.best_acc = -1.0
        self.best_epoch = 0

    # -- setup ---------------------------------------------------------------
    def _setup_data(self):
        cfg = self.cfg
        ds = get_datasource(cfg.data_source, data_root=cfg.data_root,
                            cache_dir=cfg.cache_dir, seed=cfg.seed)
        semi = ds.get_semi_data(cfg.train_count, cfg.valid_count,
                                cfg.label_ratio)
        cfg.kps_count = ds.kps_count
        cfg.inp_res, cfg.out_res = ds.inp_res, ds.out_res
        cfg.pck_ref, cfg.pck_thr = tuple(ds.pck_ref), ds.pck_thr
        self.semi = semi
        self.labeled_idxs = list(semi.labeled_idxs)
        self.unlabeled_idxs = list(semi.unlabeled_idxs)
        train_arrays = materialize(semi.semi_train, cfg.inp_res,
                                   cfg.io_workers)
        valid_arrays = materialize(semi.valid, cfg.inp_res, cfg.io_workers)
        self.train_data = put_dataset(train_arrays, semi.means)
        self.valid_data = put_dataset(valid_arrays, semi.means)
        self.rng = np.random.default_rng(cfg.seed)

    def _setup_model(self):
        cfg = self.cfg
        self.compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                              else None)
        self.model = create_pose_model(cfg.model, cfg.kps_count,
                                       cfg.feature_mode,
                                       dtype=self.compute_dtype)
        sample = jnp.zeros((1, cfg.inp_res, cfg.inp_res, 3), jnp.float32)
        params, batch_stats = init_model(self.model,
                                         jax.random.PRNGKey(cfg.seed), sample)
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.wd)
        self.state = TrainState(params, batch_stats, self.tx.init(params))
        self.logger.print("L1", "=> initialized {} model (params: {:.2f}M)"
                          .format(cfg.model, param_count(params) / 1024 ** 2))

    # -- compiled steps --------------------------------------------------------
    def _build_steps(self):
        cfg = self.cfg
        model, tx = self.model, self.tx
        data = self.train_data
        means = jnp.asarray(self.semi.means, jnp.float32)
        base_key = jax.random.PRNGKey(cfg.seed)
        pose_weight = float(cfg.pose_weight)
        dtype = self.compute_dtype

        def step(state: TrainState, idxs, step_num):
            rng = jax.random.fold_in(base_key, step_num)
            imgs = data.images[idxs]
            kps = data.kps[idxs]
            view = make_view(rng, imgs, kps, means, cfg, augment=True)

            def loss_fn(params):
                (preds, _), new_bs = forward_heatmaps(
                    model, params, state.batch_stats, view.images, True, dtype)
                s, n = L.joint_mse(preds, view.heatmaps)
                loss = pose_weight * jnp.where(n > 0, s / jnp.maximum(n, 1), s)
                return loss, (new_bs, n)

            (loss, (new_bs, n)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, new_bs, new_opt), {"pec_loss": loss,
                                                         "pec_count": n}

        donate = (0,) if cfg.donate_state else ()
        self.train_step = jax.jit(step, donate_argnums=donate)
        self.validate_step = build_validate_step(model, cfg, self.semi.means,
                                                 dtype)
        self._step_num = 0

    # -- epoch loops -----------------------------------------------------------
    def train_epoch(self, epo):
        cfg = self.cfg
        pec_counter = L.AvgCounter()
        batches = supervised_epoch_batches(self.labeled_idxs, cfg.train_bs,
                                           self.rng)
        for idxs in batches:
            self._step_num += 1
            self.state, metrics = self.train_step(
                self.state, jnp.asarray(idxs), self._step_num)
            pec_counter.update(float(metrics["pec_loss"]),
                               int(metrics["pec_count"]))
        return pec_counter.avg

    def validate(self):
        cfg = self.cfg
        acc_counters, err_counters = L.AvgCounters(), L.AvgCounters()
        preds_array = []
        k = cfg.kps_count
        n = self.valid_data.images.shape[0]
        for idxs in valid_batches(n, cfg.infer_bs):
            imgs = self.valid_data.images[jnp.asarray(idxs)]
            kps = self.valid_data.kps[jnp.asarray(idxs)]
            coords, scores, errs, accs = self.validate_step(
                self.state.params, self.state.batch_stats, imgs, kps)
            preds_array += np.asarray(coords).tolist()
            update_pck_counters(acc_counters, err_counters,
                                np.asarray(accs), np.asarray(errs),
                                len(idxs), k)
        return preds_array, acc_counters.avg(), err_counters.avg()

    # -- driver (reference main()) ----------------------------------------------
    def run(self, base_path=None):
        cfg = self.cfg
        logger = self.logger
        history = []
        for epo in range(cfg.epochs):
            epo_tm = datetime.datetime.now()
            pec_loss = self.train_epoch(epo)
            preds, accs, errs = self.validate()
            is_best = accs[-1] > self.best_acc
            if is_best:
                self.best_epoch, self.best_acc = epo, accs[-1]
            if base_path:
                from .checkpointing import save_checkpoint
                save_checkpoint(base_path, epo, self.state, is_best,
                                extra={"best_acc": self.best_acc,
                                       "best_epoch": self.best_epoch})
                if epo == 0:
                    cfg.to_json(f"{base_path}/logs/args.json")
                json_save({"pec_loss": pec_loss, "accs": accs, "errs": errs},
                          f"{base_path}/logs/logData/logData_{epo + 1}.json",
                          is_cover=True)
                json_save({"predsArray": preds},
                          f"{base_path}/logs/pseudoData/pseudoData_{epo + 1}.json",
                          is_cover=True)
            logger.print(
                "L1",
                "[{:3d}/{:3d}] | pec_loss: {:.5f} | best acc: {:.5f} (epo: {:3d})"
                " | acc: {:.5f}, err: {:.3f}".format(
                    epo + 1, cfg.epochs, pec_loss, self.best_acc,
                    self.best_epoch + 1, accs[-1], errs[-1]), start=epo_tm)
            history.append({"pec_loss": pec_loss, "accs": accs, "errs": errs})
        return history


def exec_regime(exp_mark="Supervised", params=None):
    """Reference supervised.exec: seed + config + experiment naming + run."""
    cfg = Config().override(params)
    np.random.seed(cfg.seed)
    experiment = "{}({}_{})_{}_{}".format(
        cfg.data_source, cfg.train_count, cfg.label_ratio, exp_mark,
        datetime.datetime.now().strftime("%Y%m%d%H%M%S"))
    base_path = f"{cfg.experiment_root}/{experiment}"
    logger = Logger(experiment, base_path=base_path)
    trainer = SupervisedTrainer(cfg, logger)
    return trainer.run(base_path)
