"""Classification SSL branch (reference models/classification +
datasets/classification + the Class* losses in utils/losses.py:289-354).

The reference ships models/datasets/losses for CIFAR but no project script;
this trainer closes the loop with the same regimes as the pose side:

  mode="supervised": CE on labeled samples
  mode="mt":         + EMA teacher with softmax-MSE consistency (ClassDistLoss)
  mode="mt_ubpl":    dual branches + ensemble softmax pseudo loss
                     (ClassPseudoLoss) + inverse-distance FDL
                     (ClassFeatureDistLoss), mirroring MT_UBPL

The dual head (x1, x2) of every classifier follows the reference; training
uses head x1, consistency uses both models' x1.
"""
import datetime
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.cifar import CIFAR10Data, CIFAR100Data
from ..data.sampler import (TwoStreamBatchSampler, supervised_epoch_batches,
                            valid_batches)
from .base_trainer import build_ema_state
from ..models import (create_class_model, init_model, init_model_stacked,
                      param_count)
from ..utils import Logger
from . import losses as L
from . import schedules as S
from .common import make_class_view


class ClassState(NamedTuple):
    params: dict
    batch_stats: dict
    ema_params: dict
    ema_batch_stats: dict
    opt_state: tuple


class ClassificationTrainer:
    def __init__(self, cfg: Config, mode="mt", datasource=None, logger=None):
        assert mode in ("supervised", "mt", "mt_ubpl")
        self.cfg = cfg
        self.mode = mode
        self.n_models = 2 if mode == "mt_ubpl" else 1
        self.logger = logger or Logger(f"{cfg.data_source}_class_{mode}")
        self._setup_data(datasource)
        self._setup_model()
        self._build_steps()
        self.best_acc = -1.0
        self.best_epoch = 0
        self._step_num = 0

    # ------------------------------------------------------------------ data
    def _setup_data(self, datasource):
        cfg = self.cfg
        if datasource is None:
            ds_cls = CIFAR100Data if cfg.data_source == "cifar100" else CIFAR10Data
            datasource = ds_cls(data_root=cfg.data_root,
                                cache_dir=cfg.cache_dir, seed=cfg.seed)
        self.ds = datasource
        cfg.inp_res = datasource.inp_res
        self.num_classes = datasource.num_classes
        (semi, valid, _, _, lab_idxs, unlab_idxs, means, _) = \
            datasource.get_semi_data(cfg.train_count, cfg.valid_count,
                                     cfg.label_ratio)
        self.labeled_idxs, self.unlabeled_idxs = list(lab_idxs), list(unlab_idxs)
        tr = datasource.materialize(semi, is_train=True)
        va = datasource.materialize(valid, is_train=False)
        self.train_images = jax.device_put(tr.images)
        self.train_labels = jax.device_put(tr.labels)
        self.train_islabeled = jax.device_put(tr.islabeled)
        self.valid_images = jax.device_put(va.images)
        self.valid_labels = jax.device_put(va.labels)
        self.means = jnp.asarray(means, jnp.float32)
        self.rng = np.random.default_rng(cfg.seed)

    # ----------------------------------------------------------------- model
    def _setup_model(self):
        cfg = self.cfg
        self.compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                              else None)
        self.model = create_class_model(cfg.model, self.num_classes,
                                        cfg.feature_mode,
                                        dtype=self.compute_dtype)
        sample = jnp.zeros((1, cfg.inp_res, cfg.inp_res, 3), jnp.float32)
        if self.n_models == 1:
            params, bs = init_model(self.model, jax.random.PRNGKey(cfg.seed),
                                    sample)
        else:
            rngs = jnp.stack([jax.random.PRNGKey(cfg.seed + i)
                              for i in range(self.n_models)])
            params, bs = init_model_stacked(self.model, rngs, sample)
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.wd)
        self.state = build_ema_state(self.tx, ClassState, params, bs)
        self.logger.print("L1", "=> initialized {} classifier (params: {:.2f}M)"
                          .format(cfg.model, param_count(params) / 1024 ** 2))

    def _apply(self, params, bstats, images, train):
        x = (images.astype(self.compute_dtype)
             if self.compute_dtype is not None else images)
        variables = {"params": params, "batch_stats": bstats}
        if train:
            out, mut = self.model.apply(variables, x, train=True,
                                        mutable=["batch_stats"])
            new_bs = mut["batch_stats"]
        else:
            out = self.model.apply(variables, x, train=False)
            new_bs = bstats
        (l1, l2), feat = out if self.cfg.feature_mode != "default" else (out, None)
        l1 = l1.astype(jnp.float32)
        l2 = l2.astype(jnp.float32)
        feat = feat.astype(jnp.float32) if feat is not None else None
        return (l1, l2, feat), new_bs

    # ----------------------------------------------------------------- steps
    def _build_steps(self):
        cfg = self.cfg
        base_key = jax.random.PRNGKey(cfg.seed)
        tx = self.tx
        mode = self.mode
        M = self.n_models

        def fwd_many(params, bstats, images, train=True):
            if M == 1:
                (l1, l2, f), nb = self._apply(params, bstats, images, train)
                return (l1[None], f[None] if f is not None else None), nb
            images_m = jnp.broadcast_to(images, (M,) + images.shape)

            def one(p, b, x):
                (l1, l2, f), nb = self._apply(p, b, x, train)
                return (l1, f), nb
            (l1s, fs), nbs = jax.vmap(one)(params, bstats, images_m)
            return (l1s, fs), nbs

        def step(state: ClassState, idxs, step_num, cons_weight,
                 pseudo_weight, ema_alpha):
            rng = jax.random.fold_in(base_key, step_num)
            imgs_u8 = self.train_images[idxs]
            labels = self.train_labels[idxs]
            islabeled = self.train_islabeled[idxs]
            lab = (islabeled > 0).astype(jnp.float32)
            sw_nega = (1.0 - lab) * pseudo_weight
            view = make_class_view(rng, imgs_u8, self.means, cfg)

            (t_logits, _), ema_bs = fwd_many(state.ema_params,
                                             state.ema_batch_stats, view)
            t_logits = jax.lax.stop_gradient(t_logits)

            def loss_fn(params):
                (logits, feats), new_bs = fwd_many(params, state.batch_stats,
                                                   view)
                total = 0.0
                metrics = {}
                ce_sum = 0.0
                for m in range(M):
                    s, n = L.class_loss(logits[m], labels)
                    ce = jnp.where(n > 0, s / jnp.maximum(n, 1), s)
                    ce_sum += ce
                    total += ce
                metrics["ce"] = ce_sum / M
                if mode in ("mt", "mt_ubpl"):
                    cons_sum = 0.0
                    for m in range(M):
                        s, n = L.class_dist(logits[m], t_logits[m])
                        cons_sum += cons_weight * s / jnp.maximum(n, 1)
                    total += cons_sum
                    metrics["cons"] = cons_sum / M
                if mode == "mt_ubpl":
                    ep_sum = 0.0
                    for m in range(M):
                        s, n = L.class_pseudo(logits[m], t_logits, sw_nega)
                        ep_sum += cons_weight * jnp.where(
                            n > 0, s / jnp.maximum(n, 1), s)
                    total += ep_sum
                    metrics["pseudo"] = ep_sum / M
                    if feats is not None:
                        s, n = L.class_feature_dist(feats[0], feats[1])
                        fdl = s / jnp.maximum(n, 1)
                        total += 2.0 * fdl
                        metrics["fdl"] = fdl
                metrics["batch_stats"] = new_bs
                return total, metrics

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: ema_alpha * e + (1.0 - ema_alpha) * p,
                state.ema_params, params)
            new_bs = aux.pop("batch_stats")
            return ClassState(params, new_bs, ema_params, ema_bs,
                              new_opt), aux

        self.train_step = jax.jit(step, donate_argnums=(0,))

        def eval_step(params, bstats, images_u8, labels):
            imgs = make_class_view(None, images_u8, self.means, cfg,
                                   augment=False)
            (logits, _), _ = fwd_many(params, bstats, imgs, train=False)
            mean_logits = jnp.mean(logits, axis=0)
            correct = jnp.sum(jnp.argmax(mean_logits, -1) == labels)
            return correct

        self.eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------ loop
    def train_epoch(self, epo):
        cfg = self.cfg
        cons = S.cons_weight(epo, cfg.cons_weight_max, cfg.cons_weight_min,
                             cfg.cons_weight_rampup)
        pw = S.pseudo_weight(epo, cfg.pseudo_weight_max, cfg.pseudo_weight_min,
                             cfg.pseudo_weight_rampup)
        alpha = S.ema_alpha(epo, cfg.ema_decay)
        counters = {}
        if self.mode == "supervised":
            batches = supervised_epoch_batches(self.labeled_idxs,
                                               cfg.train_bs, self.rng)
        else:
            batches = TwoStreamBatchSampler(self.unlabeled_idxs,
                                            self.labeled_idxs, cfg.train_bs,
                                            cfg.train_bs_labeled, self.rng)
        for idxs in batches:
            self._step_num += 1
            self.state, m = self.train_step(self.state, jnp.asarray(idxs),
                                            self._step_num, cons, pw, alpha)
            for k, v in m.items():
                counters.setdefault(k, L.AvgCounter()).update(float(v))
        return {k: c.avg for k, c in counters.items()}

    def validate(self):
        cfg = self.cfg
        n = self.valid_images.shape[0]
        correct = 0
        params = (self.state.ema_params if self.mode != "supervised"
                  else self.state.params)
        bstats = (self.state.ema_batch_stats if self.mode != "supervised"
                  else self.state.batch_stats)
        for idxs in valid_batches(n, cfg.infer_bs):
            c = self.eval_step(params, bstats,
                               self.valid_images[jnp.asarray(idxs)],
                               self.valid_labels[jnp.asarray(idxs)])
            correct += int(c)
        return correct / n

    def run(self):
        cfg = self.cfg
        history = []
        for epo in range(cfg.epochs):
            tm = datetime.datetime.now()
            losses = self.train_epoch(epo)
            acc = self.validate()
            if acc > self.best_acc:
                self.best_acc, self.best_epoch = acc, epo
            self.logger.print(
                "L1", "[{:3d}/{:3d}] | {} | acc: {:.4f} (best {:.4f} @ {})"
                .format(epo + 1, cfg.epochs,
                        ", ".join(f"{k}={v:.4f}" for k, v in losses.items()),
                        acc, self.best_acc, self.best_epoch + 1), start=tm)
            history.append({**losses, "acc": acc})
        return history


def exec_regime(exp_mark="Classification", params=None, mode=None):
    """CLI entry for the classification branch (reference side branch:
    models/classification + datasources/classification, never wired into
    projects/exec.py there; first-class here).

    mode: supervised | mt | mt_ubpl (default mt); cfg.model picks the net
    (VGG / ResNet / MobileNet); cfg.data_source cifar10 | cifar100.
    """
    from ..config import Config
    from .base_trainer import make_experiment
    params = dict(params or {})
    mode = mode or params.pop("mode", "mt")
    cfg = Config().override(params)
    if cfg.model.startswith(("HG", "LitePose")):
        cfg.model = "VGG"               # pose default doesn't apply here
    if cfg.data_source not in ("cifar10", "cifar100"):
        cfg.data_source = "cifar10"
    np.random.seed(cfg.seed)
    _, base_path, logger = make_experiment(cfg, f"{exp_mark}_{mode}")
    trainer = ClassificationTrainer(cfg, mode=mode, logger=logger)
    history = trainer.run()
    from ..utils import json_save
    json_save({"history": history, "best_acc": trainer.best_acc,
               "best_epoch": trainer.best_epoch},
              f"{base_path}/logs/classification.json", is_cover=True)
    return history
