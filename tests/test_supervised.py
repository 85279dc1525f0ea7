"""End-to-end supervised slice on bundled Mouse data (tiny config, CPU)."""
import os

import pytest

from ubpl_tpu.config import Config
from ubpl_tpu.train.supervised import SupervisedTrainer

HAVE_MOUSE = os.path.isdir("/root/reference/data/pose/mouse/croppeds_bbox")


@pytest.mark.skipif(not HAVE_MOUSE, reason="bundled mouse data not present")
def test_supervised_end_to_end(tmp_path):
    cfg = Config(model="HG2", data_source="Mouse", train_count=12,
                 valid_count=8, label_ratio=0.5, epochs=2, train_bs=4,
                 infer_bs=8, compute_dtype="float32",
                 force_inp_res=64, force_out_res=16,
                 cache_dir=str(tmp_path / "cache"),
                 experiment_root=str(tmp_path / "expr"))
    trainer = SupervisedTrainer(cfg)
    history = trainer.run(base_path=str(tmp_path / "run"))
    assert len(history) == 2
    for h in history:
        assert h["pec_loss"] > 0
        assert len(h["accs"][0]) == cfg.kps_count + 1
        assert 0.0 <= h["accs"][0][-1] <= 1.0
    # loss should be finite and (almost surely) lower after an epoch of tiny data
    assert history[-1]["pec_loss"] < history[0]["pec_loss"] * 10
    # checkpoint written and restorable
    from ubpl_tpu.train.checkpointing import restore_checkpoint
    state, meta = restore_checkpoint(str(tmp_path / "run"), trainer.state)
    assert meta["current_epoch"] == 1
    assert state is not None
