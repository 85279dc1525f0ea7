"""Step-execution variants must not change the math:

* fuse_teacher_forward (2 students + 2 teachers as one 4-network branch
  axis) vs separate student/teacher forwards
* scan_batches > 1 (lax.scan k batches per device call) vs per-batch steps
"""
import jax
import jax.numpy as jnp
import numpy as np

from ubpl_tpu.config import Config
from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer
from ubpl_tpu.train.supervised import SupervisedTrainer


def _cfg(**kw):
    base = dict(model="HG2", synthetic_data=True, synthetic_kps=5,
                inp_res=64, out_res=16, train_count=24, valid_count=4,
                label_ratio=0.5, train_bs=4, train_bs_labeled=2, infer_bs=4,
                epochs=1, compute_dtype="float32", donate_state=False)
    base.update(kw)
    cfg = Config(**base)
    cfg.pck_ref, cfg.pck_thr = (1, 2), 0.2
    return cfg


def _epoch(trainer):
    return trainer.train_epoch(0, trainer.epoch_schedules(0))


def test_fused_teacher_forward_equivalence():
    """One step from identical state: the fused 4-network program computes
    the same losses/updates as separate student/teacher forwards.  (Epoch-
    level comparison is NOT meaningful: fp32 reassociation noise between the
    two programs gets amplified by the 0.95 pseudo-mask threshold and
    training chaos — measured 0 at step 1, ~1e-4 at step 2, ~0.1 by step 5.)"""
    t_fused = MTUBPLTrainer(_cfg(fuse_teacher_forward=True))
    t_plain = MTUBPLTrainer(_cfg(fuse_teacher_forward=False))
    sched = t_fused.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    idxs = jnp.asarray(next(iter(t_fused.make_sampler())))
    s1, m1 = t_fused.train_step(t_fused.state, idxs, 1, *args)
    s2, m2 = t_plain.train_step(t_plain.state, idxs, 1, *args)
    for k in ("pec", "mtc", "epc", "fdc"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-5, atol=1e-7)
    e1 = jax.tree_util.tree_leaves(s1.ema_batch_stats)[0]
    e2 = jax.tree_util.tree_leaves(s2.ema_batch_stats)[0]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=1e-5, atol=1e-7)


def test_unroll_branches_equivalence():
    """One step from identical state: the unrolled per-branch plain-conv
    programs compute the same losses/updates as the vmapped (grouped-conv)
    branch ensemble.  Tolerances are program-level: plain and grouped convs
    reduce in different orders (measured ~4e-5 relative on the losses), and
    Adam's bias-corrected first step is ~±lr wherever that noise flips the
    sign of a near-zero gradient — so params get atol ≈ 2·lr."""
    t_unroll = MTUBPLTrainer(_cfg(unroll_branches=True))
    t_plain = MTUBPLTrainer(_cfg(unroll_branches=False))
    sched = t_unroll.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    idxs = jnp.asarray(next(iter(t_unroll.make_sampler())))
    s1, m1 = t_unroll.train_step(t_unroll.state, idxs, 1, *args)
    s2, m2 = t_plain.train_step(t_plain.state, idxs, 1, *args)
    for k in ("pec", "mtc", "epc", "fdc"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-3, atol=1e-6, err_msg=k)
    lr = t_plain.cfg.lr
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=2.1 * lr)


def test_scan_branches_equivalence():
    """Config.scan_branches (lax.scan over the stacked branch axis — the
    per-branch fwd/bwd body compiled once) computes the same step as the
    unrolled per-branch programs: same math, same reduction order (each
    scan iteration runs the same plain convs unroll emits), so tolerances
    are the cross-program ones of test_unroll_branches_equivalence."""
    t_scan = MTUBPLTrainer(_cfg(scan_branches=True))
    t_unroll = MTUBPLTrainer(_cfg(unroll_branches=True))
    sched = t_scan.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    idxs = jnp.asarray(next(iter(t_scan.make_sampler())))
    s1, m1 = t_scan.train_step(t_scan.state, idxs, 1, *args)
    s2, m2 = t_unroll.train_step(t_unroll.state, idxs, 1, *args)
    for k in ("pec", "mtc", "epc", "fdc"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-3, atol=1e-6, err_msg=k)
    lr = t_scan.cfg.lr
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=2.1 * lr)


def test_stream_data_equivalence():
    """Config.stream_data (host-resident training set, per-batch H2D with
    one-batch prefetch) must compute exactly what the resident-gather path
    computes: identical batch values enter the same step math, only the
    delivery differs.  Same synthetic seed -> identical arrays on both
    sides."""
    import numpy as onp
    t_res = SupervisedTrainer(_cfg())
    t_str = SupervisedTrainer(_cfg(stream_data=True))
    assert t_str.train_data is None and t_str.train_host is not None
    idxs = onp.arange(4)
    s1, m1 = t_res.train_step(t_res.state, jnp.asarray(idxs), 1)
    host = t_str.train_host
    batch = tuple(jnp.asarray(x) for x in
                  (host.images[idxs], host.kps[idxs], host.islabeled[idxs]))
    s2, m2 = t_str.train_step(t_str.state, batch, 1)
    np.testing.assert_allclose(np.asarray(m1["pec_loss"]),
                               np.asarray(m2["pec_loss"]),
                               rtol=1e-5, atol=1e-7)
    lr = t_res.cfg.lr
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=2.1 * lr)
    # the epoch driver (prefetching iterator) must run end-to-end
    out = t_str.train_epoch(0)
    assert np.isfinite(out["pec_loss"])

    import pytest
    with pytest.raises(ValueError, match="scan_batches"):
        SupervisedTrainer(_cfg(stream_data=True, scan_batches=8))
    with pytest.raises(ValueError, match="pseudo_rounds"):
        MTUBPLTrainer(_cfg(stream_data=True, pseudo_rounds=1))


def test_remat_equivalence():
    """Config.remat (jax.checkpoint around the training forward) must not
    change the math: the forward is the identical program, the backward
    recomputes it — losses match tightly; params get the usual program-level
    Adam tolerance (recomputation can reassociate reductions)."""
    t_remat = MTUBPLTrainer(_cfg(remat=True))
    t_plain = MTUBPLTrainer(_cfg(remat=False))
    sched = t_remat.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    idxs = jnp.asarray(next(iter(t_remat.make_sampler())))
    s1, m1 = t_remat.train_step(t_remat.state, idxs, 1, *args)
    s2, m2 = t_plain.train_step(t_plain.state, idxs, 1, *args)
    for k in ("pec", "mtc", "epc", "fdc"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    lr = t_plain.cfg.lr
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=2.1 * lr)


def test_mld_optimizer_step():
    """Config.optimizer='mld' (reference utils/MLDOptim.py surgery, wired
    first-class): at alpha=0 the surgery is the identity on the summed
    gradient, so one step from identical state must match plain adamw up to
    program-level noise (the mld path pulls two vjps through one forward,
    the adamw path one value_and_grad — different fusions; params get
    atol ~ 2*lr as in the unroll test).  At alpha>0 the step must run and
    stay finite."""
    t_mld0 = MTUBPLTrainer(_cfg(optimizer="mld", mld_alpha=0.0))
    t_adam = MTUBPLTrainer(_cfg())
    sched = t_mld0.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    idxs = jnp.asarray(next(iter(t_mld0.make_sampler())))
    s1, m1 = t_mld0.train_step(t_mld0.state, idxs, 1, *args)
    s2, m2 = t_adam.train_step(t_adam.state, idxs, 1, *args)
    for k in ("pec", "mtc", "epc", "fdc"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    lr = t_adam.cfg.lr
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=2.1 * lr)

    t_mld = MTUBPLTrainer(_cfg(optimizer="mld", mld_alpha=0.5))
    s3, m3 = t_mld.train_step(t_mld.state, idxs, 1, *args)
    assert all(np.isfinite(np.asarray(m3[k])).all()
               for k in ("pec", "mtc", "epc", "fdc"))
    p3 = jax.tree_util.tree_leaves(s3.params)[0]
    assert np.isfinite(np.asarray(p3)).all()

    from ubpl_tpu.train.dualpose_ubpl import DualPoseUBPLTrainer
    t_dp = DualPoseUBPLTrainer(_cfg(optimizer="mld", mld_alpha=0.5,
                                    scale_range_ema=0.05, rot_range_ema=5.0))
    s4, m4 = t_dp.train_step(t_dp.state, idxs, 1, *args)
    assert all(np.isfinite(np.asarray(m4[k])).all()
               for k in ("pec", "mtc", "epc", "fdc"))

    import pytest
    from ubpl_tpu.train.supervised import SupervisedTrainer
    with pytest.raises(ValueError, match="mld"):
        SupervisedTrainer(_cfg(optimizer="mld"))


def test_scan_batches_equivalence_mt_ubpl():
    """One k=3 scan chunk vs the same 3 plain steps.  Step 1 must match to
    float noise (proves batch order / RNG fold / step numbering align);
    later steps only loosely — the scan body is a different compiled program
    whose rounding Adam amplifies by ~lr per sign flip (measured: 0 at step 1,
    ~1e-5 at step 2, ~4e-3 at step 3 even for plain supervised)."""
    t_scan = MTUBPLTrainer(_cfg(scan_batches=3))
    t_plain = MTUBPLTrainer(_cfg(scan_batches=1))
    assert t_scan.train_scan_step is not None
    sched = t_scan.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    batches = [np.asarray(b) for _, b in zip(range(3), t_scan.make_sampler())]
    _, ms = t_scan.train_scan_step(t_scan.state,
                                   jnp.asarray(np.stack(batches)), 0, *args)
    s2 = t_plain.state
    plain = []
    for i, idxs in enumerate(batches):
        s2, m = t_plain.train_step(s2, jnp.asarray(idxs), i + 1, *args)
        plain.append(m)
    np.testing.assert_allclose(np.asarray(ms["pec"][0]),
                               np.asarray(plain[0]["pec"]), rtol=1e-6)
    # steps 2-3: ordering smoke only — the 0.95 pseudo-mask makes MT_UBPL's
    # divergence discrete (measured ~5% by step 3), so only gross batch/RNG
    # misalignment would exceed this
    for i in range(3):
        np.testing.assert_allclose(np.asarray(ms["pec"][i]),
                                   np.asarray(plain[i]["pec"]), rtol=0.25)


def test_scan_batches_equivalence_supervised():
    t_scan = SupervisedTrainer(_cfg(scan_batches=3))
    t_plain = SupervisedTrainer(_cfg(scan_batches=1))
    from ubpl_tpu.data import supervised_epoch_batches
    batches = [np.asarray(b) for b in supervised_epoch_batches(
        t_scan.labeled_idxs, 4, t_scan.rng)][:3]
    _, ms = t_scan.train_scan_step(t_scan.state,
                                   jnp.asarray(np.stack(batches)), 0)
    s2 = t_plain.state
    plain = []
    for i, idxs in enumerate(batches):
        s2, m = t_plain.train_step(s2, jnp.asarray(idxs), i + 1)
        plain.append(m)
    np.testing.assert_allclose(float(ms["pec_loss"][0]),
                               float(plain[0]["pec_loss"]), rtol=1e-6)
    for i in range(3):
        np.testing.assert_allclose(float(ms["pec_loss"][i]),
                                   float(plain[i]["pec_loss"]), rtol=2e-2)


def test_fused_mt_equivalence():
    """MT's fused [student, teacher] forward == separate forwards (one step)."""
    from ubpl_tpu.train.mean_teacher import MeanTeacherTrainer
    t_fused = MeanTeacherTrainer(_cfg(fuse_teacher_forward=True))
    t_plain = MeanTeacherTrainer(_cfg(fuse_teacher_forward=False))
    sched = t_fused.epoch_schedules(0)
    idxs = jnp.asarray(next(iter(t_fused.make_sampler())))
    s1, m1 = t_fused.train_step(t_fused.state, idxs, 1,
                                sched["cons_weight"], sched["ema_alpha"])
    s2, m2 = t_plain.train_step(t_plain.state, idxs, 1,
                                sched["cons_weight"], sched["ema_alpha"])
    for k in ("pec_loss", "mtc_loss"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-5, atol=1e-7)


def test_fused_dualpose_equivalence():
    """DualPose's fused per-branch-view forward (students on the strong view,
    teachers on the weak view) == separate forwards (one step)."""
    from ubpl_tpu.train.dualpose_ubpl import DualPoseUBPLTrainer
    t_fused = DualPoseUBPLTrainer(_cfg(fuse_teacher_forward=True))
    t_plain = DualPoseUBPLTrainer(_cfg(fuse_teacher_forward=False))
    sched = t_fused.epoch_schedules(0)
    args = (sched["cons_weight"], sched["fdl_weight"],
            sched["pseudo_weight"], sched["ema_alpha"])
    idxs = jnp.asarray(next(iter(t_fused.make_sampler())))
    s1, m1 = t_fused.train_step(t_fused.state, idxs, 1, *args)
    s2, m2 = t_plain.train_step(t_plain.state, idxs, 1, *args)
    for k in ("pec", "mtc", "epc", "fdc"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-5, atol=1e-7)
