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


def test_scan_batches_equivalence_mt_ubpl():
    t_plain = MTUBPLTrainer(_cfg(scan_batches=1))
    t_scan = MTUBPLTrainer(_cfg(scan_batches=4))
    m_plain, m_scan = _epoch(t_plain), _epoch(t_scan)
    # 12 unlabeled / bs 4 -> 6 steps: one 4-chunk scan + 2 plain leftovers
    assert t_scan.train_scan_step is not None
    np.testing.assert_allclose(m_scan["pec_losses"], m_plain["pec_losses"],
                               rtol=1e-5)
    np.testing.assert_allclose(m_scan["mtc_losses"], m_plain["mtc_losses"],
                               rtol=1e-4, atol=1e-7)
    p1 = jax.tree_util.tree_leaves(t_plain.state.params)[0]
    p2 = jax.tree_util.tree_leaves(t_scan.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-5, atol=1e-6)


def test_scan_batches_equivalence_supervised():
    t_plain = SupervisedTrainer(_cfg(scan_batches=1))
    t_scan = SupervisedTrainer(_cfg(scan_batches=3))
    m_plain, m_scan = _epoch(t_plain), _epoch(t_scan)
    np.testing.assert_allclose(m_scan["pec_loss"], m_plain["pec_loss"],
                               rtol=1e-5)
