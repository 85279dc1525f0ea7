"""Offline UBPL pseudo-labeling loop: end-to-end on synthetic data."""
import jax
import numpy as np
import pytest

from ubpl_tpu.config import Config
from ubpl_tpu.train.mt_ubpl import MTUBPLTrainer
from ubpl_tpu.train.pseudo_loop import PseudoLabelingLoop


def test_pseudo_loop_round(tmp_path):
    cfg = Config(model="HG2", synthetic_data=True, synthetic_kps=5,
                 inp_res=64, out_res=16, train_count=16, valid_count=8,
                 label_ratio=0.5, train_bs=4, train_bs_labeled=2, infer_bs=8,
                 epochs=1, compute_dtype="float32")
    cfg.pck_ref, cfg.pck_thr = (1, 2), 0.2
    trainer = MTUBPLTrainer(cfg)
    loop = PseudoLabelingLoop(trainer, aug_views=2, reliable_pct=0.5,
                              batch_size=8)
    unl = np.asarray(trainer.unlabeled_idxs)
    kps_before = np.asarray(trainer.train_data.kps)[unl].copy()
    assert (kps_before == 0).all()   # unlabeled start with zeroed kps

    sel, ens = loop.round(jax.random.PRNGKey(0), apply=True)
    K = cfg.kps_count
    assert sel.enable.shape == (len(unl), K)
    assert ens.coords.shape == (len(unl), K, 2)
    np.testing.assert_allclose(ens.w1 + ens.w2, 1.0, atol=1e-9)

    kps_after = np.asarray(trainer.train_data.kps)[unl]
    selected = sel.enable > 0
    if selected.any():
        # selected joints got coordinates + visibility injected
        assert (kps_after[selected][:, 2] == 1).all()
        assert (np.abs(kps_after[selected][:, :2]) > 0).any()
    # unselected joints remain zero
    assert (kps_after[~selected] == 0).all()

    # a second round keeps working (LMA caches roll forward)
    sel2, _ = loop.round(jax.random.PRNGKey(1), apply=False)
    assert sel2.enable.shape == (len(unl), K)


def test_pseudo_rounds_first_class(tmp_path):
    """cfg.pseudo_rounds wires the UBPL selection loop into the trainer run:
    a round fires on the configured epoch, selected kps enter the training
    pool, and the sample flips into the labeled pool (islabeled gate)."""
    cfg = Config(model="HG2", synthetic_data=True, synthetic_kps=5,
                 inp_res=64, out_res=16, train_count=16, valid_count=8,
                 label_ratio=0.5, train_bs=4, train_bs_labeled=2, infer_bs=8,
                 epochs=1, compute_dtype="float32",
                 pseudo_rounds=1, pseudo_interval=1, pseudo_aug_views=1)
    cfg.pck_ref, cfg.pck_thr = (1, 2), 0.2
    trainer = MTUBPLTrainer(cfg)
    unl = np.asarray(trainer.unlabeled_idxs)
    islab_before = np.asarray(trainer.train_data.islabeled)[unl]
    assert (islab_before == 0).all()

    trainer.run(str(tmp_path / "exp"))
    assert trainer._pseudo_rounds_done == 1
    # audit JSON written by the round
    import os
    assert os.path.exists(str(tmp_path / "exp" / "logs" / "pseudoRounds" /
                              "round_1.json"))
    sel = trainer._pseudo_loop  # loop was created
    assert sel is not None
    kps_after = np.asarray(trainer.train_data.kps)[unl]
    islab_after = np.asarray(trainer.train_data.islabeled)[unl]
    got = kps_after[..., 2] > 0           # injected joints
    if got.any():
        # samples with injected kps flipped into the labeled pool
        assert (islab_after[got.any(axis=1)] == 1).all()
    # samples without any injected kps stay unlabeled
    assert (islab_after[~got.any(axis=1)] == 0).all()
