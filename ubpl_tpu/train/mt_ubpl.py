"""MT+UBPL trainer — the flagship regime (reference projects/MT_UBPL.py).

Two (student + EMA-teacher) branches over two augmented views with four
constraints per step:
  PEC  gated pose MSE on labeled samples           (MT_UBPL.py:258-268)
  MTC  consistency vs own teacher, last stacks      (:246-256)
  EPC  ensemble pseudo-label loss: target = mean of BOTH teachers' last
       stacks, confidence-masked at pseudoScoreThr, unlabeled only (:270-298)
  FDC  feature decorrelation between the two branches on labeled samples
       (:300-331); the reference backs total_loss through both models with
       retain_graph so FDC's gradient lands TWICE in each branch — we keep
       that exact semantics via a 2x FDC term in the summed loss.

TPU-native structure: the 2-branch ensemble is a leading axis vmapped over
stacked params (instead of Python loops over nn.Modules), so the step runs
2 student + 2 teacher hourglass passes per view as single batched XLA
programs.  Everything — augmentation, 8 forwards, 4 losses, backward for
both branches, both EMA updates — is one jitted, state-donating call.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import TwoStreamBatchSampler
from .base_trainer import BaseTrainer
from .common import make_view
from .mld_optim import mld_optimizer
from . import losses as L
from . import schedules as S


class DualState(NamedTuple):
    params: dict           # stacked [M, ...]
    batch_stats: dict      # stacked [M, ...]
    ema_params: dict       # stacked [M, ...]
    ema_batch_stats: dict  # stacked [M, ...]
    opt_state: tuple


class MTUBPLTrainer(BaseTrainer):
    regime = "MT_UBPL"
    valid_heads = ("teacher1", "teacher2", "mean")
    n_models = 2
    supports_pseudo_loop = True   # cfg.pseudo_rounds > 0 enables UBPL rounds
    supports_mld = True           # cfg.optimizer = "mld": primary = PEC,
                                  # secondary = MTC + EPC + 2*FDC

    @property
    def n_views(self):
        return self.cfg.br_num * self.cfg.br_aug_num  # 2 by default

    # ----------------------------------------------------------------- setup
    def _setup_model(self):
        cfg = self.cfg
        self.model = self._make_model()
        params, batch_stats = self._init_n(self.model, self.n_models)
        base_tx = optax.adamw(cfg.lr, weight_decay=cfg.wd)
        self.tx = (mld_optimizer(base_tx, cfg.mld_alpha)
                   if cfg.optimizer == "mld" else base_tx)
        self.state = self._jit_build_ema_state(DualState, params,
                                               batch_stats)
        self._log_model_init(params, "MDSs")

    # ----------------------------------------------------------------- steps
    def _build_steps(self):
        cfg = self.cfg
        model, tx = self.model, self.tx
        data = self.train_data
        means = self.means
        dtype = self.compute_dtype
        base_key = jax.random.PRNGKey(cfg.seed)
        pose_weight = float(cfg.pose_weight)
        epc_weight = float(cfg.ensemble_pseudo_weight)
        score_thr = float(cfg.pseudo_score_thr)
        use_epc = bool(cfg.use_ensemble_pseudo)
        fdl_cov = cfg.fdl_type == "covariance"
        fdl_label = cfg.fdl_label
        n_views = self.n_views
        M = self.n_models
        # fused path: 2 students + 2 teachers stacked as one 4-network branch
        # axis, so every view is ONE batched forward instead of separate
        # student/teacher dispatches (the teacher halves are stop_gradient'd)
        fuse = bool(cfg.fuse_teacher_forward)
        branch_fwd = self.make_branch_forward(
            model, dtype, train=True, n_branch=2 * M if fuse else M)

        def fwd_stacked(params_m, bs_m, images, train=True):
            return branch_fwd(params_m, bs_m, images)

        concat0 = lambda a, b: jnp.concatenate([a, b], axis=0)

        def step(state: DualState, idxs, step_num, cons_weight, fdl_weight,
                 pseudo_weight, ema_alpha):
            rng = jax.random.fold_in(base_key, step_num)
            imgs, kps, islabeled = self.fetch_batch(data, idxs)
            sw_pos, sw_nega, _ = self.sample_weights(islabeled, pseudo_weight)
            views = [make_view(jax.random.fold_in(rng, a), imgs, kps, means,
                               cfg, augment=True,
                               occluder_bank=self.occluder_bank)
                     for a in range(n_views)]

            B = imgs.shape[0]

            def forward_views(params_m, bs_m):
                """Per-view forwards; cfg.fold_views concatenates the views
                into one batched pass (BN stats pool over both views)."""
                if cfg.fold_views:
                    all_imgs = jnp.concatenate([v.images for v in views], 0)
                    (p, f), new_bs = fwd_stacked(params_m, bs_m, all_imgs,
                                                 True)
                    ps = [p[:, a * B:(a + 1) * B] for a in range(n_views)]
                    fs = ([f[:, a * B:(a + 1) * B] for a in range(n_views)]
                          if f is not None else [None] * n_views)
                    return ps, fs, new_bs
                ps, fs = [], []
                for v in views:
                    (p, f), bs_m = fwd_stacked(params_m, bs_m, v.images, True)
                    ps.append(p)
                    fs.append(f)
                return ps, fs, bs_m

            if not fuse:
                # teachers (no grad; train-mode BN, MT_UBPL.py:235-238)
                outs_ema_pre, _, ema_bs_pre = forward_views(
                    state.ema_params, state.ema_batch_stats)
                outs_ema_pre = [jax.lax.stop_gradient(p)
                                for p in outs_ema_pre]

            def loss_fn(params):
                if fuse:
                    p4 = jax.tree_util.tree_map(concat0, params,
                                                state.ema_params)
                    b4 = jax.tree_util.tree_map(concat0, state.batch_stats,
                                                state.ema_batch_stats)
                    ps, fs, new_b4 = forward_views(p4, b4)
                    outs = [p[:M] for p in ps]
                    feats = [f[:M] if f is not None else None for f in fs]
                    outs_ema = [jax.lax.stop_gradient(p[M:]) for p in ps]
                    bs_state = jax.tree_util.tree_map(lambda t: t[:M], new_b4)
                    ema_bs = jax.tree_util.tree_map(
                        lambda t: jax.lax.stop_gradient(t[M:]), new_b4)
                else:
                    outs, feats, bs_state = forward_views(params,
                                                          state.batch_stats)
                    outs_ema, ema_bs = outs_ema_pre, ema_bs_pre
                # outs[a]: [M, B, S, H, W, K]; feats[a]: [M, B, S, hf, wf, C]

                mtc_sum = jnp.zeros((self.n_models,))
                mtc_count = jnp.zeros((self.n_models,))
                pec_sum = jnp.zeros((self.n_models,))
                pec_count = jnp.zeros((self.n_models,))
                epc_sum = jnp.zeros((self.n_models,))
                epc_count = jnp.zeros((self.n_models,))
                n_pseudo = 0.0
                n_sel = 0.0
                for a, v in enumerate(views):
                    for m in range(self.n_models):
                        s, n = L.joint_dist(outs[a][m][:, -1],
                                            outs_ema[a][m][:, -1])
                        mtc_sum = mtc_sum.at[m].add(s)
                        mtc_count = mtc_count.at[m].add(n)
                        s, n = L.joint_mse(outs[a][m], v.heatmaps, v.gate,
                                           sw_pos, use_gate=True,
                                           use_sample_weight=True)
                        pec_sum = pec_sum.at[m].add(s)
                        pec_count = pec_count.at[m].add(n)
                        if use_epc:
                            s, stats = L.joint_pseudo3(outs[a][m], outs_ema[a],
                                                       sw_nega, score_thr)
                            epc_sum = epc_sum.at[m].add(s)
                            epc_count = epc_count.at[m].add(stats.num_pseudo)
                            n_pseudo += stats.num_pseudo
                            n_sel += stats.num_selected

                def weighted(sums, counts, w):
                    return w * jnp.where(counts > 0,
                                         sums / jnp.maximum(counts, 1), sums)

                mtc = weighted(mtc_sum, mtc_count, cons_weight)
                pec = weighted(pec_sum, pec_count, pose_weight)
                epc = (weighted(epc_sum, epc_count, epc_weight) if use_epc
                       else jnp.zeros((self.n_models,)))

                # FDC between the two branches, per view, label-filtered
                fdl_mask = {"labeled": sw_pos > 0, "unlabeled": sw_pos == 0,
                            "all": jnp.ones_like(sw_pos, bool)}[fdl_label]
                fdc_sum, fdc_count = 0.0, 0.0
                for a in range(n_views):
                    if fdl_cov:
                        c, n = L.features_cov_masked(feats[a][0], feats[a][1],
                                                     fdl_mask)
                    else:
                        c, n = L.joint_feature_dist_masked(feats[a][0],
                                                           feats[a][1],
                                                           fdl_mask)
                    fdc_sum, fdc_count = fdc_sum + c, fdc_count + n
                fdc = fdl_weight * jnp.where(fdc_count > 0,
                                             fdc_sum / jnp.maximum(fdc_count, 1),
                                             fdc_sum)
                # reference backs each branch's total (incl. the shared FDC)
                # with retain_graph; summed grads see FDC twice (see module doc)
                pri = jnp.sum(pec)
                sec = jnp.sum(mtc + epc) + 2.0 * fdc
                aux = {"pec": pec, "pec_count": pec_count,
                       "mtc": mtc, "mtc_count": mtc_count,
                       "epc": epc, "epc_count": epc_count,
                       "fdc": fdc, "fdc_count": fdc_count,
                       "n_pseudo": n_pseudo, "n_sel": n_sel,
                       "batch_stats": bs_state, "ema_batch_stats": ema_bs}
                return (pri, sec), aux

            if cfg.optimizer == "mld":
                # MLD gradient surgery needs the two loss groups' gradients
                # separately: one forward, two pullbacks over the same
                # linearization — the JAX form of the reference's two
                # retain_graph backwards (utils/MLDOptim.py:18-29).
                (pri, sec), vjp_fn, aux = jax.vjp(loss_fn, state.params,
                                                  has_aux=True)
                g_pri, = vjp_fn((jnp.ones_like(pri), jnp.zeros_like(sec)))
                g_sec, = vjp_fn((jnp.zeros_like(pri), jnp.ones_like(sec)))
                grads = (g_pri, g_sec)
            else:
                def total_fn(params):
                    (pri, sec), aux = loss_fn(params)
                    return pri + sec, aux

                (_, aux), grads = jax.value_and_grad(total_fn, has_aux=True)(
                    state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: ema_alpha * e + (1.0 - ema_alpha) * p,
                state.ema_params, params)
            new_state = DualState(params, aux.pop("batch_stats"), ema_params,
                                  aux.pop("ema_batch_stats"), new_opt)
            return new_state, aux

        self.compile_train_step(step)
        # validate both teachers + their prediction mean (MT_UBPL.py:355-408)
        self.validate_step = self._build_validate_multi(self.model,
                                                        self.n_models, True)

    # ------------------------------------------------------------------ loop
    def epoch_schedules(self, epo):
        return S.ssl_epoch_schedules(self.cfg, epo)

    def make_sampler(self):
        cfg = self.cfg
        return TwoStreamBatchSampler(self.unlabeled_idxs, self.labeled_idxs,
                                     cfg.train_bs, cfg.train_bs_labeled,
                                     self.rng)

    def train_epoch(self, epo, schedules):
        M = self.n_models
        pec_cs = [L.AvgCounter() for _ in range(M)]
        mtc_cs = [L.AvgCounter() for _ in range(M)]
        epc_cs = [L.AvgCounter() for _ in range(M)]
        fdc_c = L.AvgCounter()
        metrics = self.run_train_steps(
            self.make_sampler(), schedules["cons_weight"],
            schedules["fdl_weight"], schedules["pseudo_weight"],
            schedules["ema_alpha"])
        for m in metrics:
            for i in range(M):
                pec_cs[i].update(float(m["pec"][i]), int(m["pec_count"][i]))
                mtc_cs[i].update(float(m["mtc"][i]), int(m["mtc_count"][i]))
                epc_cs[i].update(float(m["epc"][i]), max(int(m["epc_count"][i]), 1))
            fdc_c.update(float(m["fdc"]), max(int(m["fdc_count"]), 1))
        return {"pec_losses": [c.avg for c in pec_cs],
                "mtc_losses": [c.avg for c in mtc_cs],
                "epc_losses": [c.avg for c in epc_cs],
                "fdc_loss": fdc_c.avg}

    def validate(self):
        return self._validate_heads(self.validate_step,
                                    self.state.ema_params,
                                    self.state.ema_batch_stats)

    def format_epoch_log(self, losses, accs, errs):
        return ("pec: [{}] | mtc: [{}] | epc: [{}] | fdc: {:.5f} | "
                "mean acc: {:.5f}, err: {:.3f}".format(
                    ", ".join(f"{v:.5f}" for v in losses["pec_losses"]),
                    ", ".join(f"{v:.5f}" for v in losses["mtc_losses"]),
                    ", ".join(f"{v:.5f}" for v in losses["epc_losses"]),
                    losses["fdc_loss"], accs[-1][-1], errs[-1][-1]))


def exec_regime(exp_mark="MT_UBPL", params=None):
    from .base_trainer import run_regime
    return run_regime(MTUBPLTrainer, exp_mark, params)
