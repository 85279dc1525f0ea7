"""Classification branch tests on synthetic CIFAR-shaped data."""
import numpy as np
import pytest

from ubpl_tpu.config import Config
from ubpl_tpu.data.cifar import CIFAR10Data


def synthetic_ds(tmp_path, n_train=64, n_valid=32):
    rng = np.random.default_rng(0)
    return CIFAR10Data.from_arrays(
        rng.integers(0, 256, (n_train, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 10, (n_train,)),
        rng.integers(0, 256, (n_valid, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 10, (n_valid,)),
        cache_dir=str(tmp_path / "cache"), seed=7)


def test_cifar_semi_split(tmp_path):
    ds = synthetic_ds(tmp_path)
    semi, valid, labeled, unlabeled, li, ui, means, stds = \
        ds.get_semi_data(40, 20, 0.25)
    assert len(semi) == 40 and len(valid) == 20
    assert len(labeled) == 10 and len(unlabeled) == 30
    assert all(r["label"] == -1 for r in unlabeled)
    assert all(r["label_test"] >= 0 for r in unlabeled)
    arrays = ds.materialize(semi, is_train=True)
    assert arrays.images.shape == (40, 32, 32, 3)
    assert (arrays.labels[np.array(ui)] == -1).all()
    assert (arrays.labels_test >= 0).all()


@pytest.mark.parametrize("mode,model", [("supervised", "MobileNet"),
                                        ("mt", "MobileNet"),
                                        ("mt_ubpl", "MobileNet")])
def test_classification_trainer(tmp_path, mode, model):
    from ubpl_tpu.train.classification import ClassificationTrainer
    cfg = Config(model=model, data_source="cifar10", train_count=32,
                 valid_count=16, label_ratio=0.5, epochs=1, train_bs=8,
                 train_bs_labeled=4, infer_bs=16, compute_dtype="float32",
                 cache_dir=str(tmp_path / f"cache_{mode}"))
    trainer = ClassificationTrainer(cfg, mode=mode,
                                    datasource=synthetic_ds(
                                        tmp_path / mode, 32, 16))
    history = trainer.run()
    h = history[0]
    assert np.isfinite(h["ce"])
    assert 0.0 <= h["acc"] <= 1.0
    if mode in ("mt", "mt_ubpl"):
        assert "cons" in h
    if mode == "mt_ubpl":
        assert "pseudo" in h and "fdl" in h
