"""Data layer tests: Mouse datasource (bundled data), semi splits, caching,
samplers, materialization."""
import os

import numpy as np
import pytest

from ubpl_tpu.data import (MouseData, TwoStreamBatchSampler, materialize,
                           supervised_epoch_batches, valid_batches,
                           get_datasource)

HAVE_MOUSE = os.path.isdir("/root/reference/data/pose/mouse/croppeds_bbox")


@pytest.fixture(scope="module")
def mouse(tmp_path_factory):
    if not HAVE_MOUSE:
        pytest.skip("bundled mouse data not present")
    cache = tmp_path_factory.mktemp("cache")
    return MouseData(cache_dir=str(cache), seed=1388)


def test_semi_split(mouse):
    sd = mouse.get_semi_data(100, 200, 0.3, re_mean=False)
    assert len(sd.semi_train) == 100
    assert len(sd.valid) == 200
    assert len(sd.labeled) == 30
    assert len(sd.unlabeled) == 70
    assert sorted(sd.labeled_idxs + sd.unlabeled_idxs) == list(range(100))
    for rec in sd.unlabeled:
        assert rec["islabeled"] == 0
        assert all(kp == [0, 0, 0] for kp in rec["kps"])
        # truth retained for pseudo-label audit (reference lsp.py:90)
        assert any(kp[2] > 0 for kp in rec["kps_test"])
    # split cache pins reruns to identical splits
    sd2 = mouse.get_semi_data(100, 200, 0.3, re_mean=False)
    assert [r["imageID"] for r in sd2.semi_train] == \
           [r["imageID"] for r in sd.semi_train]


def test_norm_params(mouse):
    sd = mouse.get_semi_data(20, 10, 0.5, re_mean=True)
    assert len(sd.means) == 3 and len(sd.stds) == 3
    assert 0.2 < sd.means[0] < 0.8


def test_materialize(mouse):
    sd = mouse.get_semi_data(16, 8, 0.5, re_mean=False)
    arrs = materialize(sd.semi_train, inp_res=256)
    assert arrs.images.shape == (16, 256, 256, 3)
    assert arrs.images.dtype == np.uint8
    assert arrs.kps.shape == (16, 9, 3)
    assert set(arrs.islabeled.tolist()) == {0, 1}
    lab = arrs.islabeled == 1
    assert (arrs.kps[lab, :, 2] > 0).any()
    assert (arrs.kps[~lab] == 0).all()


def test_two_stream_sampler():
    rng = np.random.default_rng(0)
    s = TwoStreamBatchSampler(list(range(30)), list(range(30, 40)),
                              batch_size=4, secondary_batch_size=2, rng=rng)
    batches = list(s)
    assert len(batches) == 15
    prim_seen = []
    for b in batches:
        assert len(b) == 4
        assert all(i < 30 for i in b[:2])    # unlabeled first
        assert all(i >= 30 for i in b[2:])   # labeled second
        prim_seen += list(b[:2])
    assert sorted(prim_seen) == list(range(30))  # primary iterated once


def test_supervised_batches_and_valid():
    rng = np.random.default_rng(0)
    bs = supervised_epoch_batches(list(range(10)), 4, rng)
    assert len(bs) == 2 and all(len(b) == 4 for b in bs)  # drop_last
    vb = valid_batches(10, 4)
    assert [len(b) for b in vb] == [4, 4, 2]


def test_datasource_registry():
    for name in ("Mouse", "FLIC", "LSP", "AP10K", "FLY", "Pranav"):
        ds = get_datasource(name, data_root="/nonexistent", cache_dir="/tmp/x")
        assert ds.inp_res == 256 and ds.out_res == 64
        assert ds.kps_count == len(ds.sel_kp_idxs)
