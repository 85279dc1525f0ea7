"""Mean-Teacher trainer (reference projects/MT.py).

Student + EMA teacher, two independently-augmented views per batch
(DS_mds semantics), consistency on last stacks + gated pose loss on both
views, epoch-indexed EMA.  Batches follow the two-stream layout
(2 unlabeled + 2 labeled; utils/mt/data.py:105-132).

The whole step — two on-device augmentations, 4 hourglass passes
(student/teacher x 2 views), losses, backward, EMA — is one jitted call.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import TwoStreamBatchSampler
from .base_trainer import BaseTrainer
from .common import forward_heatmaps, make_view
from . import losses as L
from . import schedules as S


class MTState(NamedTuple):
    params: dict
    batch_stats: dict
    ema_params: dict
    ema_batch_stats: dict
    opt_state: tuple


class MeanTeacherTrainer(BaseTrainer):
    regime = "MT"
    valid_heads = ("student", "teacher")
    n_views = 2  # brNum * br_augNum (projects/MT.py:59)

    # ----------------------------------------------------------------- setup
    def _setup_model(self):
        cfg = self.cfg
        self.model = self._make_model()
        params, batch_stats = self._init_n(self.model, None)
        # teacher starts as a copy (reference inits a second net then EMA
        # immediately pulls it toward the student with alpha=0 at epoch 0)
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.wd)
        self.state = self._jit_build_ema_state(MTState, params, batch_stats)
        self._log_model_init(params, "MT")

    # ----------------------------------------------------------------- steps
    def _build_steps(self):
        cfg = self.cfg
        model, tx = self.model, self.tx
        data = self.train_data
        means = self.means
        dtype = self.compute_dtype
        base_key = jax.random.PRNGKey(cfg.seed)
        pose_weight = float(cfg.pose_weight)

        # fused path: stack [student, teacher] as a 2-network branch axis so
        # each view is ONE batched forward (teacher half stop_gradient'd)
        fuse = bool(cfg.fuse_teacher_forward)
        branch2 = (self.make_branch_forward(model, dtype, train=True,
                                            n_branch=2) if fuse else None)
        stack2 = lambda a, b: jnp.stack([a, b], axis=0)

        def step(state: MTState, idxs, step_num, cons_weight, ema_alpha):
            rng = jax.random.fold_in(base_key, step_num)
            imgs, kps, islabeled = self.fetch_batch(data, idxs)
            sw_pos, _, _ = self.sample_weights(islabeled, 0.0)
            views = [make_view(jax.random.fold_in(rng, a), imgs, kps, means,
                               cfg, augment=True,
                               occluder_bank=self.occluder_bank)
                     for a in range(self.n_views)]

            if not fuse:
                # teacher forward (no grad; train-mode BN updates teacher
                # stats, reference MT.py:231-234 under model_ema.train())
                ema_bs_pre = state.ema_batch_stats
                outs_ema_pre = []
                for v in views:
                    (p_ema, _), ema_bs_pre = forward_heatmaps(
                        model, state.ema_params, ema_bs_pre, v.images, True,
                        dtype)
                    outs_ema_pre.append(jax.lax.stop_gradient(p_ema))

            def loss_fn(params):
                mtc_sum, mtc_count = 0.0, 0.0
                pec_sum, pec_count = 0.0, 0.0
                if fuse:
                    b2 = jax.tree_util.tree_map(stack2, state.batch_stats,
                                                state.ema_batch_stats)
                    p2 = jax.tree_util.tree_map(stack2, params,
                                                state.ema_params)
                else:
                    bs_state = state.batch_stats
                for a, v in enumerate(views):
                    if fuse:
                        (pf, _), b2 = branch2(p2, b2, v.images)
                        preds = pf[0]
                        out_ema = jax.lax.stop_gradient(pf[1])
                    else:
                        (preds, _), bs_state = forward_heatmaps(
                            model, params, bs_state, v.images, True, dtype,
                            remat=cfg.remat)
                        out_ema = outs_ema_pre[a]
                    s, n = L.joint_dist(preds[:, -1], out_ema[:, -1])
                    mtc_sum, mtc_count = mtc_sum + s, mtc_count + n
                    s, n = L.joint_mse(preds, v.heatmaps, v.gate, sw_pos,
                                       use_gate=True, use_sample_weight=True)
                    pec_sum, pec_count = pec_sum + s, pec_count + n
                if fuse:
                    bs_state = jax.tree_util.tree_map(lambda t: t[0], b2)
                    ema_bs = jax.tree_util.tree_map(
                        lambda t: jax.lax.stop_gradient(t[1]), b2)
                else:
                    ema_bs = ema_bs_pre
                mtc = cons_weight * jnp.where(mtc_count > 0,
                                              mtc_sum / jnp.maximum(mtc_count, 1),
                                              mtc_sum)
                pec = pose_weight * jnp.where(pec_count > 0,
                                              pec_sum / jnp.maximum(pec_count, 1),
                                              pec_sum)
                aux = {"pec_loss": pec, "pec_count": pec_count,
                       "mtc_loss": mtc, "mtc_count": mtc_count,
                       "batch_stats": bs_state, "ema_batch_stats": ema_bs}
                return pec + mtc, aux

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            # reference update_ema_variables: epoch-indexed alpha, params only
            ema_params = jax.tree_util.tree_map(
                lambda e, p: ema_alpha * e + (1.0 - ema_alpha) * p,
                state.ema_params, params)
            new_state = MTState(params, aux.pop("batch_stats"), ema_params,
                                aux.pop("ema_batch_stats"), new_opt)
            return new_state, aux

        self.compile_train_step(step)
        self.validate_step = self._build_validate_multi(self.model, 2, False)

    # ------------------------------------------------------------------ loop
    def epoch_schedules(self, epo):
        cfg = self.cfg
        return {"cons_weight": S.cons_weight(epo, cfg.cons_weight_max,
                                             cfg.cons_weight_min,
                                             cfg.cons_weight_rampup),
                "ema_alpha": S.ema_alpha(epo, cfg.ema_decay)}

    def make_sampler(self):
        cfg = self.cfg
        return TwoStreamBatchSampler(self.unlabeled_idxs, self.labeled_idxs,
                                     cfg.train_bs, cfg.train_bs_labeled,
                                     self.rng)

    def train_epoch(self, epo, schedules):
        counters = {k: L.AvgCounter() for k in ("pec", "mtc")}
        metrics = self.run_train_steps(self.make_sampler(),
                                       schedules["cons_weight"],
                                       schedules["ema_alpha"])
        for m in metrics:
            counters["pec"].update(float(m["pec_loss"]), int(m["pec_count"]))
            counters["mtc"].update(float(m["mtc_loss"]), int(m["mtc_count"]))
        return {"pec_loss": counters["pec"].avg, "mtc_loss": counters["mtc"].avg}

    def validate(self):
        stack = lambda a, b: jnp.stack([a, b])
        params2 = jax.tree_util.tree_map(stack, self.state.params,
                                         self.state.ema_params)
        bs2 = jax.tree_util.tree_map(stack, self.state.batch_stats,
                                     self.state.ema_batch_stats)
        return self._validate_heads(self.validate_step, params2, bs2)


def exec_regime(exp_mark="MT", params=None):
    from .base_trainer import run_regime
    return run_regime(MeanTeacherTrainer, exp_mark, params)
