"""Synthetic fixture archives in each reference datasource's EXACT on-disk
format (FLIC examples.mat, LSP/LSPET joints.mat pair, AP-10K COCO json, Fly
pickle+png scan, Pranav json+png scan, CIFAR batches-py pickles), shared by
the parser tests and the materialize->train->validate e2e smokes."""
import json
import os
import pickle

import numpy as np


def write_png(path, w=40, h=30, seed=0):
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, np.random.default_rng(seed).integers(
        0, 255, (h, w, 3), dtype=np.uint8).astype(np.uint8))


def make_flic(data_root, n=4, n_bad=1, seed=0):
    """examples.mat struct array: filepath + [2, 11] coords; n_bad samples
    get a NaN joint (filtered by the parser)."""
    import scipy.io as sio
    base = os.path.join(data_root, "pose", "FLIC")
    os.makedirs(os.path.join(base, "images"), exist_ok=True)
    names = np.empty((1, n), dtype=object)
    coords = np.empty((1, n), dtype=object)
    rng = np.random.default_rng(seed)
    for i in range(n):
        names[0, i] = np.array([f"img{i}.jpg"])
        c = rng.uniform(10, 200, (2, 11))
        if i >= n - n_bad:
            c[:, 5] = np.nan
        coords[0, i] = c
        write_png(os.path.join(base, "images", f"img{i}.jpg"),
                  w=240, h=220, seed=i)
    examples = np.zeros((1, n), dtype=[("filepath", object),
                                       ("coords", object)])
    examples["filepath"] = names
    examples["coords"] = coords
    sio.savemat(os.path.join(base, "examples.mat"), {"examples": examples})
    return n - n_bad


def make_lsp(data_root, n_lsp=4, n_lspet=5, seed=1):
    """BOTH archives the reference concatenates (datasources/lsp.py:31):
    lsp joints.mat [3,14,N] with 4-digit ids, lspet joints.mat [14,3,N] with
    5-digit ids, each with one invisible-joint sample that gets filtered."""
    import scipy.io as sio
    rng = np.random.default_rng(seed)
    lsp = os.path.join(data_root, "pose", "lsp", "lsp")
    lspet = os.path.join(data_root, "pose", "lsp", "lspet")

    j_lsp = rng.uniform(5, 100, (3, 14, n_lsp))
    j_lsp[2] = 1.0
    j_lsp[2, 0, 1] = 0.0
    sio.savemat(_mk(os.path.join(lsp, "joints.mat")), {"joints": j_lsp})
    for i in range(n_lsp):
        img_id = "im{}".format(str(1000000 + i + 1)[3:])
        write_png(os.path.join(lsp, "images", f"{img_id}.jpg"),
                  w=120, h=110, seed=i)

    j_lspet = rng.uniform(5, 100, (14, 3, n_lspet))
    j_lspet[:, 2, :] = 1.0
    j_lspet[0, 2, 2] = 0.0
    sio.savemat(_mk(os.path.join(lspet, "joints.mat")), {"joints": j_lspet})
    for i in range(n_lspet):
        img_id = "im{}".format(str(1000000 + i + 1)[2:])
        write_png(os.path.join(lspet, "images", f"{img_id}.jpg"),
                  w=120, h=110, seed=100 + i)
    return n_lsp - 1 + n_lspet - 1


def _mk(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def make_ap10k(data_root, n=3, category="rat", seed=2):
    """COCO-style annotations json + data/ images; one sample in another
    category (filtered when selecting `category`)."""
    base = os.path.join(data_root, "pose", "ap10k")
    os.makedirs(os.path.join(base, "annotations"), exist_ok=True)
    rng = np.random.default_rng(seed)
    images, anns = [], []
    for i in range(n):
        images.append({"id": i, "file_name": f"a{i}.jpg"})
        kp = rng.uniform(5, 90, (17, 3))
        kp[:, 2] = 2
        anns.append({"image_id": i, "category_id": 1 if i < n - 1 else 2,
                     "keypoints": [float(v) for v in kp.reshape(-1)],
                     "num_keypoints": 17, "bbox": [1, 2, 90, 90]})
        write_png(os.path.join(base, "data", f"a{i}.jpg"),
                  w=100, h=100, seed=i)
    j = {"images": images, "annotations": anns,
         "categories": [{"id": 1, "name": category},
                        {"id": 2, "name": "dog"}]}
    with open(os.path.join(base, "annotations", "train.json"), "w") as f:
        json.dump(j, f)
    return n - 1


def make_fly(data_root, n=3, seed=3):
    """syn_anno.pth pickle of normalized coords + trainA/ png scan."""
    base = os.path.join(data_root, "pose", "fly")
    os.makedirs(os.path.join(base, "trainA"), exist_ok=True)
    rng = np.random.default_rng(seed)
    kps_map = {}
    for i in range(n):
        name = f"f{i}.png"
        kps_map[name] = rng.uniform(0.1, 0.9, (10, 2)).tolist()
        write_png(os.path.join(base, "trainA", name), w=640, h=480, seed=i)
    with open(os.path.join(base, "syn_anno.pth"), "wb") as f:
        pickle.dump(kps_map, f)
    return n


def make_pranav(data_root, n=3, seed=4, w=100, h=100):
    """data.json of per-image kps + img/ png scan."""
    base = os.path.join(data_root, "pose", "Openfield-Pranav", "box_train")
    os.makedirs(os.path.join(base, "img"), exist_ok=True)
    rng = np.random.default_rng(seed)
    kps_map = {}
    for i in range(n):
        name = f"p{i}.png"
        kps_map[name] = rng.uniform(5, min(w, h) - 5, (4, 2)).tolist()
        write_png(os.path.join(base, "img", name), w=w, h=h, seed=i)
    with open(os.path.join(base, "data.json"), "w") as f:
        json.dump(kps_map, f)
    return n


def make_cifar(data_root, name="cifar10", n_train=40, n_test=16, seed=5):
    """torchvision's real on-disk batches-py pickle layout: uint8 [N, 3072]
    CHW rows under b"data", labels under b"labels"/b"fine_labels"."""
    rng = np.random.default_rng(seed)
    num_classes = 10 if name == "cifar10" else 100
    dirname = ("cifar-10-batches-py" if name == "cifar10"
               else "cifar-100-python")
    label_key = b"labels" if name == "cifar10" else b"fine_labels"
    base = os.path.join(data_root, f"{name}(Classification)", "data", dirname)
    os.makedirs(base, exist_ok=True)

    def write(fn, count):
        d = {b"data": rng.integers(0, 256, (count, 3072), dtype=np.uint8),
             label_key: rng.integers(0, num_classes, (count,)).tolist()}
        with open(os.path.join(base, fn), "wb") as f:
            pickle.dump(d, f)

    if name == "cifar10":
        per = (n_train + 4) // 5
        for i in range(1, 6):
            write(f"data_batch_{i}", per)
        write("test_batch", n_test)
    else:
        write("train", n_train)
        write("test", n_test)
