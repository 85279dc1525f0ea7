"""Checkpoint resume + inference API tests (synthetic data, tiny shapes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ubpl_tpu.config import Config


def _cfg(tmp_path, **kw):
    base = dict(model="HG2", synthetic_data=True, synthetic_kps=5,
                inp_res=64, out_res=16, train_count=16, valid_count=8,
                label_ratio=0.5, train_bs=4, train_bs_labeled=2, infer_bs=8,
                epochs=2, compute_dtype="float32",
                experiment_root=str(tmp_path / "expr"))
    base.update(kw)
    cfg = Config(**base)
    cfg.pck_ref, cfg.pck_thr = (1, 2), 0.2
    return cfg


def test_resume_roundtrip(tmp_path):
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer
    cfg = _cfg(tmp_path)
    run_dir = str(tmp_path / "run")
    t1 = MTUBPLTrainer(cfg)
    t1.run(base_path=run_dir)
    best = list(t1.best_acc)

    t2 = MTUBPLTrainer(_cfg(tmp_path, epochs=3))
    start = t2.resume(run_dir)
    assert start == 2                       # continue after epoch index 1
    assert t2.best_acc == pytest.approx(best)
    # restored params match the trained ones
    a = jax.tree_util.tree_leaves(t1.state.params)[0]
    b = jax.tree_util.tree_leaves(t2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # and training continues from there
    t2.run(base_path=run_dir, resume=True)


def test_failed_save_preserves_previous_checkpoint(tmp_path, monkeypatch):
    """A failed checkpoint write must leave the previous epoch's checkpoint
    intact (staged-write ordering) and no stale tmp/staging dirs behind."""
    import glob
    from ubpl_tpu.train import checkpointing as ck
    state = {"w": np.arange(4.0)}
    base = str(tmp_path / "run")
    ck.save_checkpoint(base, 0, state)

    class Boom:
        def save(self, *a, **k):
            raise IOError("disk full")

    monkeypatch.setattr(ck, "_CKPTR", Boom())
    with pytest.warns(UserWarning, match="checkpoint save"):
        ck.save_checkpoint(base, 1, {"w": np.zeros(4)})
    monkeypatch.setattr(ck, "_CKPTR", None)

    restored, meta = ck.restore_checkpoint(base)
    assert int(meta["current_epoch"]) == 0
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0))
    leftovers = (glob.glob(str(tmp_path / "run" / "ckpts" / "*.new"))
                 + glob.glob(str(tmp_path / "run" / "ckpts" / "*.old"))
                 + glob.glob(str(tmp_path / "run" / "ckpts"
                                 / "*orbax-checkpoint-tmp*")))
    assert leftovers == []


def test_restore_crash_window_fallbacks(tmp_path):
    """A crash between the two checkpoint renames leaves '<t>.old' (and
    possibly a committed '<t>.new'); restore_checkpoint must read them
    rather than silently restarting from scratch."""
    import os
    from ubpl_tpu.train import checkpointing as ck
    base = str(tmp_path / "run")
    ck.save_checkpoint(base, 0, {"w": np.arange(3.0)})
    target, _ = ck._paths(base)
    os.rename(target, target + ".old")       # crash after first rename
    with pytest.warns(UserWarning, match="crash-window"):
        restored, meta = ck.restore_checkpoint(base)
    assert int(meta["current_epoch"]) == 0
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(3.0))

    ck.save_checkpoint(base, 1, {"w": np.ones(3)})
    os.rename(target, target + ".new")       # crash before final rename
    with pytest.warns(UserWarning, match="crash-window"):
        _, m2 = ck.restore_checkpoint(base)
    assert int(m2["current_epoch"]) == 1     # .new (committed) wins
    # and the next save adopts the committed copy instead of deleting it
    ck.save_checkpoint(base, 2, {"w": np.zeros(3)})
    _, m3 = ck.restore_checkpoint(base)
    assert int(m3["current_epoch"]) == 2


def test_resume_restores_pseudo_state(tmp_path):
    """Resume with cfg.pseudo_rounds>0 must restore the round budget and the
    injected pseudo kps/islabeled arrays, not silently reset them (ADVICE
    r2): an interrupted run continues on the same dataset."""
    from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer
    ps = dict(pseudo_rounds=1, pseudo_interval=1, pseudo_aug_views=1)
    run_dir = str(tmp_path / "run_ps")
    t1 = MTUBPLTrainer(_cfg(tmp_path, **ps))
    t1.run(base_path=run_dir)
    assert t1._pseudo_rounds_done == 1
    kps1 = np.asarray(t1.train_data.kps)
    isl1 = np.asarray(t1.train_data.islabeled)
    assert isl1.sum() > np.asarray(t1.labeled_idxs).size - 1  # round applied

    t2 = MTUBPLTrainer(_cfg(tmp_path, epochs=3, **ps))
    start = t2.resume(run_dir)
    assert start == 2
    assert t2._pseudo_rounds_done == 1       # round budget not reset
    np.testing.assert_allclose(np.asarray(t2.train_data.kps), kps1)
    np.testing.assert_allclose(np.asarray(t2.train_data.islabeled), isl1)
    # continuing must not spend another round (budget already exhausted)
    t2.run(base_path=run_dir, resume=True)
    assert t2._pseudo_rounds_done == 1


def test_pose_estimator_pipelined_chunks():
    """Multi-chunk predict (double-buffered transfers) must give the same
    per-image results as one big batch: eval-mode BN makes inference
    per-image deterministic regardless of batching/padding."""
    import jax.numpy as jnp
    from ubpl_tpu.infer import PoseEstimator
    from ubpl_tpu.models import create_pose_model, init_model
    cfg = Config(model="HG2", kps_count=5, inp_res=64, out_res=16,
                 compute_dtype="float32")
    m = create_pose_model("HG2", 5, cfg.feature_mode, dtype=None)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params, batch_stats = init_model(m, jax.random.PRNGKey(0), sample)
    imgs = np.random.default_rng(0).integers(
        0, 256, (10, 64, 64, 3), dtype=np.uint8)
    est_chunked = PoseEstimator(m, params, batch_stats, (0.4, 0.4, 0.4),
                                cfg, batch_size=4)   # 3 chunks, last padded
    est_single = PoseEstimator(m, params, batch_stats, (0.4, 0.4, 0.4),
                               cfg, batch_size=16)   # 1 padded chunk
    k1, s1 = est_chunked.predict(imgs)
    k2, s2 = est_single.predict(imgs)
    assert k1.shape == (10, 5, 2) and s1.shape == (10, 5)
    np.testing.assert_allclose(k1, k2, atol=1e-4)
    np.testing.assert_allclose(s1, s2, atol=1e-4)
    # empty request is well-formed
    k0, s0 = est_chunked.predict(np.zeros((0, 64, 64, 3), np.uint8))
    assert k0.shape == (0, 5, 2) and s0.shape == (0, 5)


def test_pose_estimator_from_checkpoint(tmp_path):
    from ubpl_tpu.train.supervised import SupervisedTrainer
    from ubpl_tpu.infer import PoseEstimator
    cfg = _cfg(tmp_path, epochs=1)
    run_dir = str(tmp_path / "run_sup")
    tr = SupervisedTrainer(cfg)
    tr.run(base_path=run_dir)
    est = PoseEstimator.from_checkpoint(
        run_dir, model="HG2", kps_count=5, head="student",
        compute_dtype="float32", inp_res=64, out_res=16)
    imgs = np.random.default_rng(0).integers(0, 256, (5, 64, 64, 3),
                                             dtype=np.uint8)
    kps, scores = est.predict(imgs)
    assert kps.shape == (5, 5, 2)
    assert scores.shape == (5, 5)
    assert np.isfinite(kps).all()
