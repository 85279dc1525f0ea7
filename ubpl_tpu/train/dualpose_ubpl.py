"""DualPose(+UBPL) trainer (reference projects/DualPose_UBPL.py).

Same dual-branch structure as MT_UBPL but with the DS_mt view pairing:
ONE student view (full augmentation) and ONE independently-augmented *weak*
teacher view (scaleRange_ema/rotRange_ema), plus a teacher-confidence-masked
consistency (JointDistLoss_mt2 with cons sample weights: labeled=1,
unlabeled=pseudoWeight).

exec_home runs this trainer twice: "DualPose" (FDL off, no ensemble pseudo)
and "DualPose_UBPL" (both on) — projects/exec.py:21-25.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import TwoStreamBatchSampler
from .base_trainer import BaseTrainer
from .common import make_view
from .mld_optim import mld_optimizer
from .mt_ubpl import DualState
from . import losses as L
from . import schedules as S


class DualPoseUBPLTrainer(BaseTrainer):
    regime = "DualPose_UBPL"
    valid_heads = ("teacher1", "teacher2", "mean")
    n_models = 2
    supports_pseudo_loop = True   # cfg.pseudo_rounds > 0 enables UBPL rounds
    supports_mld = True           # cfg.optimizer = "mld": primary = PEC,
                                  # secondary = MTC + EPC + 2*FDC

    def _setup_model(self):
        cfg = self.cfg
        self.model = self._make_model()
        params, batch_stats = self._init_n(self.model, self.n_models)
        base_tx = optax.adamw(cfg.lr, weight_decay=cfg.wd)
        self.tx = (mld_optimizer(base_tx, cfg.mld_alpha)
                   if cfg.optimizer == "mld" else base_tx)
        self.state = self._jit_build_ema_state(DualState, params,
                                               batch_stats)
        self._log_model_init(params, "DualPose")

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
        use_fdl = cfg.fdl_weight_max > 0 or cfg.fdl_weight_min > 0

        M = self.n_models
        # fused path: [M students on the strong view; M teachers on the weak
        # view] stacked as one 2M-network branch axis with per-branch images
        fuse = bool(cfg.fuse_teacher_forward)
        branch_fwd = self.make_branch_forward(
            model, dtype, train=True, n_branch=2 * M if fuse else M,
            stacked_images=fuse)
        concat0 = lambda a, b: jnp.concatenate([a, b], axis=0)

        def fwd_stacked(params_m, bs_m, images, train=True):
            return branch_fwd(params_m, bs_m, images)

        def step(state: DualState, idxs, step_num, cons_weight, fdl_weight,
                 pseudo_weight, ema_alpha):
            rng = jax.random.fold_in(base_key, step_num)
            imgs, kps, islabeled = self.fetch_batch(data, idxs)
            sw_pos, sw_nega, sw_cons = self.sample_weights(islabeled,
                                                           pseudo_weight)
            # student view: full augmentation; teacher view: weak (DS_mt)
            stu = make_view(jax.random.fold_in(rng, 0), imgs, kps, means, cfg,
                            augment=True, occluder_bank=self.occluder_bank)
            ema = make_view(jax.random.fold_in(rng, 1), imgs, kps, means, cfg,
                            augment=True, scale_range=cfg.scale_range_ema,
                            rot_range=cfg.rot_range_ema,
                            occluder_bank=self.occluder_bank,
                            use_occlusion=cfg.use_occlusion_ema)

            if not fuse:
                ema_bs_pre = state.ema_batch_stats
                (outs_ema_pre, _), ema_bs_pre = fwd_stacked(
                    state.ema_params, ema_bs_pre, ema.images, True)
                outs_ema_pre = jax.lax.stop_gradient(outs_ema_pre)

            def loss_fn(params):
                if fuse:
                    p4 = jax.tree_util.tree_map(concat0, params,
                                                state.ema_params)
                    b4 = jax.tree_util.tree_map(concat0, state.batch_stats,
                                                state.ema_batch_stats)
                    imgs4 = jnp.concatenate(
                        [jnp.broadcast_to(stu.images,
                                          (M,) + stu.images.shape),
                         jnp.broadcast_to(ema.images,
                                          (M,) + ema.images.shape)], axis=0)
                    (pf, ff), new_b4 = fwd_stacked(p4, b4, imgs4, True)
                    outs, feats = pf[:M], (ff[:M] if ff is not None else None)
                    outs_ema = jax.lax.stop_gradient(pf[M:])
                    bs_state = jax.tree_util.tree_map(lambda t: t[:M], new_b4)
                    ema_bs = jax.tree_util.tree_map(
                        lambda t: jax.lax.stop_gradient(t[M:]), new_b4)
                else:
                    (outs, feats), bs_state = fwd_stacked(params,
                                                          state.batch_stats,
                                                          stu.images, True)
                    outs_ema, ema_bs = outs_ema_pre, ema_bs_pre
                mtc_sum = jnp.zeros((M,))
                mtc_count = jnp.zeros((M,))
                pec_sum = jnp.zeros((M,))
                pec_count = jnp.zeros((M,))
                epc_sum = jnp.zeros((M,))
                epc_count = jnp.zeros((M,))
                n_pseudo, n_sel = 0.0, 0.0
                for m in range(M):
                    s, n, _ = L.joint_dist_mt2(outs[m][:, -1],
                                               outs_ema[m][:, -1],
                                               sample_weight=sw_cons,
                                               use_sample_weight=True,
                                               score_thr=score_thr)
                    mtc_sum, mtc_count = mtc_sum.at[m].add(s), mtc_count.at[m].add(n)
                    s, n = L.joint_mse(outs[m], stu.heatmaps, stu.gate, sw_pos,
                                       use_gate=True, use_sample_weight=True)
                    pec_sum, pec_count = pec_sum.at[m].add(s), pec_count.at[m].add(n)
                    if use_epc:
                        s, stats = L.joint_pseudo3(outs[m], outs_ema, sw_nega,
                                                   score_thr)
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
                       else jnp.zeros((M,)))

                fdc = 0.0
                fdc_count = 0.0
                if use_fdl:
                    fdl_mask = {"labeled": sw_pos > 0,
                                "unlabeled": sw_pos == 0,
                                "all": jnp.ones_like(sw_pos, bool)}[fdl_label]
                    if fdl_cov:
                        c, n = L.features_cov_masked(feats[0], feats[1],
                                                     fdl_mask)
                    else:
                        c, n = L.joint_feature_dist_masked(feats[0], feats[1],
                                                           fdl_mask)
                    fdc = fdl_weight * jnp.where(n > 0, c / jnp.maximum(n, 1), c)
                    fdc_count = n
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
                # one forward, two pullbacks (see mt_ubpl.py / mld_optim.py)
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
        self.validate_step = self._build_validate_multi(self.model,
                                                        self.n_models, True)

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


def exec_regime(exp_mark="DualPose_UBPL", params=None):
    from .base_trainer import run_regime
    # the reference's DualPose defaults weaken the teacher view
    # (projects/DualPose_UBPL.py exec grid uses scaleRange_ema=0.05, rotRange_ema=5.0)
    params = dict(params or {})
    if not any(k in params for k in ("scale_range_ema", "scaleRange_ema")):
        params["scale_range_ema"] = 0.05
    if not any(k in params for k in ("rot_range_ema", "rotRange_ema")):
        params["rot_range_ema"] = 5.0
    return run_regime(DualPoseUBPLTrainer, exp_mark, params)
