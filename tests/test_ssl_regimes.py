"""End-to-end smoke tests of the three SSL regimes on bundled Mouse data.

Tiny configs (HG2, 16 train images) on CPU; asserts finite losses, correct
metric shapes, teacher EMA movement, and pseudo-stat plumbing.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubpl_tpu.config import Config

HAVE_MOUSE = os.path.isdir("/root/reference/data/pose/mouse/croppeds_bbox")
pytestmark = pytest.mark.skipif(not HAVE_MOUSE,
                                reason="bundled mouse data not present")


def tiny_cfg(tmp_path, **kw):
    base = dict(model="HG2", data_source="Mouse", train_count=16,
                valid_count=8, label_ratio=0.5, epochs=1, train_bs=4,
                train_bs_labeled=2, infer_bs=8, compute_dtype="float32",
                force_inp_res=64, force_out_res=16,
                cache_dir=str(tmp_path / "cache"),
                experiment_root=str(tmp_path / "expr"))
    base.update(kw)
    return Config(**base)


def test_mean_teacher(tmp_path):
    from ubpl_tpu.train.mean_teacher import MeanTeacherTrainer
    trainer = MeanTeacherTrainer(tiny_cfg(tmp_path))
    p0 = jax.tree_util.tree_map(jnp.copy, trainer.state.ema_params)
    history = trainer.run()
    assert len(history) == 1
    h = history[0]
    assert np.isfinite(h["pec_loss"]) and np.isfinite(h["mtc_loss"])
    assert len(h["accs"]) == 2          # student + teacher heads
    assert len(h["accs"][0]) == trainer.cfg.kps_count + 1
    # teacher must have moved toward the student (alpha=0 at epoch 0)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0,
        trainer.state.ema_params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_mt_ubpl(tmp_path):
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer
    trainer = MTUBPLTrainer(tiny_cfg(tmp_path))
    history = trainer.run()
    h = history[0]
    assert len(h["pec_losses"]) == 2 and len(h["mtc_losses"]) == 2
    assert all(np.isfinite(v) for v in h["pec_losses"] + h["mtc_losses"]
               + h["epc_losses"] + [h["fdc_loss"]])
    assert len(h["accs"]) == 3          # teacher1, teacher2, ensemble mean
    # the two branches must stay distinct (different init seeds)
    p = trainer.state.params
    leaves = jax.tree_util.tree_leaves(p)
    assert any(float(jnp.max(jnp.abs(l[0] - l[1]))) > 0 for l in leaves
               if l.ndim > 1)


def test_dualpose_ubpl(tmp_path):
    from ubpl_tpu.train.dualpose_ubpl import DualPoseUBPLTrainer
    cfg = tiny_cfg(tmp_path, scale_range_ema=0.05, rot_range_ema=5.0)
    trainer = DualPoseUBPLTrainer(cfg)
    history = trainer.run()
    h = history[0]
    assert all(np.isfinite(v) for v in h["pec_losses"] + h["mtc_losses"]
               + h["epc_losses"] + [h["fdc_loss"]])
    assert len(h["accs"]) == 3


def test_dualpose_plain_mode(tmp_path):
    """DualPose (no UBPL): FDL off + no ensemble pseudo (exec.py:21-22)."""
    from ubpl_tpu.train.dualpose_ubpl import DualPoseUBPLTrainer
    cfg = tiny_cfg(tmp_path, fdl_weight_max=0.0, fdl_weight_min=0.0,
                   use_ensemble_pseudo=False)
    trainer = DualPoseUBPLTrainer(cfg)
    h = trainer.run()[0]
    assert h["fdc_loss"] == 0.0
    assert all(v == 0.0 for v in h["epc_losses"])
