"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Exercises the same path as __graft_entry__.dryrun_multichip: the FULL
MT_UBPL training step jitted over a ("model", "data") mesh with branch
params sharded over 'model' (shard_map) and batches constrained to 'data'.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ubpl_tpu.config import Config
from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer
from ubpl_tpu.train.supervised import SupervisedTrainer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cfg(**kw):
    base = dict(model="HG2", synthetic_data=True, synthetic_kps=5,
                inp_res=64, out_res=16, train_count=32, valid_count=8,
                label_ratio=0.5, train_bs=8, train_bs_labeled=4, infer_bs=8,
                epochs=1, compute_dtype="float32", donate_state=False)
    base.update(kw)
    cfg = Config(**base)
    cfg.pck_ref, cfg.pck_thr = (1, 2), 0.2
    return cfg


def _one_step(trainer):
    sched = trainer.epoch_schedules(0)
    idxs = next(iter(trainer.make_sampler()))
    state, m = trainer.train_step(trainer.state, jnp.asarray(idxs), 1,
                                  sched["cons_weight"], sched["fdl_weight"],
                                  sched["pseudo_weight"], sched["ema_alpha"])
    jax.block_until_ready(m)
    return state, m


def test_mt_ubpl_model_data_mesh():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("model", "data"))
    trainer = MTUBPLTrainer(_cfg(), mesh=mesh)
    state, m = _one_step(trainer)
    assert np.isfinite(np.asarray(m["pec"])).all()
    # branch params stay sharded over the model axis
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert "model" in str(leaf.sharding.spec) or leaf.sharding.is_fully_replicated is False


def test_mt_ubpl_data_only_mesh():
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    trainer = MTUBPLTrainer(_cfg(), mesh=mesh)
    _, m = _one_step(trainer)
    assert np.isfinite(np.asarray(m["pec"])).all()


def test_mesh_vs_single_device_equivalence():
    """dp sharding must not change the math: identical metrics vs no mesh."""
    t_single = MTUBPLTrainer(_cfg())
    _, m1 = _one_step(t_single)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    t_mesh = MTUBPLTrainer(_cfg(), mesh=mesh)
    _, m2 = _one_step(t_mesh)
    np.testing.assert_allclose(np.asarray(m1["pec"]), np.asarray(m2["pec"]),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(m1["mtc"]), np.asarray(m2["mtc"]),
                               rtol=2e-3, atol=1e-5)


def test_supervised_data_mesh():
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    cfg = _cfg()
    trainer = SupervisedTrainer(cfg, mesh=mesh)
    idxs = np.asarray(trainer.labeled_idxs[:cfg.train_bs])
    state, m = trainer.train_step(trainer.state, jnp.asarray(idxs), 1)
    assert np.isfinite(float(m["pec_loss"]))
