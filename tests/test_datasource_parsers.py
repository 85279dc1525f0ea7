"""Parser tests for the non-Mouse datasources against synthetic fixture
archives in the reference's exact on-disk formats (FLIC examples.mat, LSP
joints.mat, AP-10K COCO json, Fly pickle, Pranav json)."""
import json
import os
import pickle

import numpy as np
import pytest

from ubpl_tpu.data.sources import (FLICData, LSPData, AP10KData, FLYData,
                                   PranavData)


def _write_png(path, w=40, h=30):
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, np.random.default_rng(0).integers(
        0, 255, (h, w, 3), dtype=np.uint8).astype(np.uint8))


@pytest.fixture()
def data_root(tmp_path):
    return str(tmp_path / "data")


def test_flic_parser(data_root, tmp_path):
    import scipy.io as sio
    base = os.path.join(data_root, "pose", "FLIC")
    os.makedirs(os.path.join(base, "images"), exist_ok=True)
    n = 4
    names = np.empty((1, n), dtype=object)
    coords = np.empty((1, n), dtype=object)
    rng = np.random.default_rng(0)
    for i in range(n):
        names[0, i] = np.array([f"img{i}.jpg"])
        c = rng.uniform(10, 200, (2, 11))
        if i == 3:
            c[:, 5] = np.nan          # incomplete joints -> filtered
        coords[0, i] = c
        _write_png(os.path.join(base, "images", f"img{i}.jpg"))
    examples = np.zeros((1, n), dtype=[("filepath", object),
                                       ("coords", object)])
    examples["filepath"] = names
    examples["coords"] = coords
    sio.savemat(os.path.join(base, "examples.mat"), {"examples": examples})

    ds = FLICData(data_root=data_root, cache_dir=str(tmp_path / "c"), seed=1)
    recs = ds._load_records()
    assert len(recs) == 3                      # nan-joint sample filtered
    assert all(len(r["kps"]) == 11 for r in recs)
    assert all(os.path.exists(r["imagePath"]) for r in recs)


from fixture_archives import make_lsp as make_lsp_fixture  # noqa: E402


def test_lsp_parser(data_root, tmp_path):
    n_expected = make_lsp_fixture(data_root)
    ds = LSPData(data_root=data_root, cache_dir=str(tmp_path / "c"), seed=1)
    recs = ds._load_records()
    # candidate pool is the UNION of lsp + lspet (datasources/lsp.py:31,43)
    assert len(recs) == n_expected
    assert all(len(r["kps"]) == 14 for r in recs)
    ids = [r["imageID"] for r in recs]
    assert "im0001" in ids                     # lsp: 4-digit padding
    assert "im00001" in ids                    # lspet: 5-digit padding
    # lsp records precede lspet records, as in the reference concatenation
    assert ids.index("im0001") < ids.index("im00001")
    assert all(os.path.exists(r["imagePath"]) for r in recs)


def test_ap10k_parser(data_root, tmp_path):
    base = os.path.join(data_root, "pose", "ap10k")
    os.makedirs(os.path.join(base, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(base, "data"), exist_ok=True)
    rng = np.random.default_rng(2)
    images, anns = [], []
    for i in range(3):
        images.append({"id": i, "file_name": f"a{i}.jpg"})
        kp = rng.uniform(1, 90, (17, 3))
        kp[:, 2] = 2
        anns.append({"image_id": i, "category_id": 1 if i < 2 else 2,
                     "keypoints": [float(v) for v in kp.reshape(-1)],
                     "num_keypoints": 17, "bbox": [1, 2, 30, 40]})
        _write_png(os.path.join(base, "data", f"a{i}.jpg"))
    j = {"images": images, "annotations": anns,
         "categories": [{"id": 1, "name": "rat"}, {"id": 2, "name": "dog"}]}
    with open(os.path.join(base, "annotations", "train.json"), "w") as f:
        json.dump(j, f)

    ds = AP10KData(category="rat", data_root=data_root,
                   cache_dir=str(tmp_path / "c"), seed=1)
    recs = ds._load_records()
    assert len(recs) == 2                      # only category "rat"
    assert all(len(r["kps"]) == 17 for r in recs)
    assert recs[0]["bbox"] == [[1, 2], [31, 42]]


def test_fly_parser(data_root, tmp_path):
    base = os.path.join(data_root, "pose", "fly")
    os.makedirs(os.path.join(base, "trainA"), exist_ok=True)
    rng = np.random.default_rng(3)
    kps_map = {}
    for i in range(3):
        name = f"f{i}.png"
        kps_map[name] = rng.uniform(0.1, 0.9, (10, 2)).tolist()
        _write_png(os.path.join(base, "trainA", name))
    with open(os.path.join(base, "syn_anno.pth"), "wb") as f:
        pickle.dump(kps_map, f)

    ds = FLYData(data_root=data_root, cache_dir=str(tmp_path / "c"), seed=1)
    recs = ds._load_records()
    assert len(recs) == 3
    assert all(len(r["kps"]) == 6 for r in recs)     # selKpIdxs filter
    # normalized coords scaled into the 640x480 frame
    assert all(0 <= kp[0] <= 640 and 0 <= kp[1] <= 480
               for r in recs for kp in r["kps"])


def test_pranav_parser(data_root, tmp_path):
    base = os.path.join(data_root, "pose", "Openfield-Pranav", "box_train")
    os.makedirs(os.path.join(base, "img"), exist_ok=True)
    rng = np.random.default_rng(4)
    kps_map = {}
    for i in range(3):
        name = f"p{i}.png"
        kps_map[name] = rng.uniform(1, 99, (4, 2)).tolist()
        _write_png(os.path.join(base, "img", name))
    with open(os.path.join(base, "data.json"), "w") as f:
        json.dump(kps_map, f)

    ds = PranavData(data_root=data_root, cache_dir=str(tmp_path / "c"),
                    seed=1)
    recs = ds._load_records()
    assert len(recs) == 3
    assert all(len(r["kps"]) == 4 for r in recs)


def test_semi_pipeline_on_fixture(data_root, tmp_path):
    """get_semi_data + materialize run end-to-end on a fixture datasource."""
    base = os.path.join(data_root, "pose", "Openfield-Pranav", "box_train")
    os.makedirs(os.path.join(base, "img"), exist_ok=True)
    rng = np.random.default_rng(4)
    kps_map = {}
    for i in range(6):
        name = f"p{i}.png"
        kps_map[name] = rng.uniform(1, 25, (4, 2)).tolist()
        _write_png(os.path.join(base, "img", name), w=32, h=32)
    with open(os.path.join(base, "data.json"), "w") as f:
        json.dump(kps_map, f)
    from ubpl_tpu.data import materialize
    ds = PranavData(data_root=data_root, cache_dir=str(tmp_path / "c2"),
                    seed=2)
    semi = ds.get_semi_data(4, 2, 0.5, re_mean=True)
    arrays = materialize(semi.semi_train, ds.inp_res)
    assert arrays.images.shape == (4, 256, 256, 3)
    assert arrays.kps.shape == (4, 4, 3)
