"""Dataset materialization: records -> device-ready arrays.

The reference re-decodes and re-resizes every image from disk on every epoch
inside Dataset.__getitem__ (datasets/dataset.py:24-25, single-threaded).
TPU-native design: decode + resize each image exactly once into a pinned
uint8 array (threaded host IO; optionally the C++ loader in
ubpl_tpu/native), push the whole dataset to device HBM, and do all
per-sample augmentation inside the compiled step.  A 1248-image Mouse split
at 256x256x3 uint8 is ~245 MB — trivially HBM-resident.
"""
import concurrent.futures as cf
from typing import List, NamedTuple

import numpy as np


class PoseArrays(NamedTuple):
    images: np.ndarray     # [N, R, R, 3] uint8, BGR (cv2 order, like reference)
    kps: np.ndarray        # [N, K, 3] float32, coords in inp_res space
    kps_test: np.ndarray   # [N, K, 3] float32 (truth retained for pseudo audit)
    islabeled: np.ndarray  # [N] int32
    image_ids: list        # [N] str


def _load_one(path, inp_res):
    from .native_io import imread_resize
    return imread_resize(path, inp_res)


def load_images_bgr(paths: List[str], inp_res: int, workers: int = 16) -> np.ndarray:
    from ..native import io_lib
    nat = io_lib.load()
    if nat is not None:
        rgb, failures = nat.decode_resize_batch(paths, inp_res, workers)
        if failures == 0:
            return rgb[..., ::-1].copy()  # reference (cv2) channel order
    out = np.empty((len(paths), inp_res, inp_res, 3), np.uint8)
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        for i, img in enumerate(ex.map(lambda p: _load_one(p, inp_res), paths)):
            out[i] = img
    return out


def _resize_kps(kps, orig_w, orig_h, inp_res):
    """Reference image_resize: non-aspect-preserving scale to inp_res^2."""
    k = np.asarray(kps, np.float32).reshape(-1, 3).copy()
    k[:, 0] *= inp_res / orig_w
    k[:, 1] *= inp_res / orig_h
    return k


def materialize(records: List[dict], inp_res: int = 256,
                workers: int = 16) -> PoseArrays:
    """Load + resize every record once; resize kps into inp_res coords."""
    from .native_io import image_size
    paths = [r["imagePath"] for r in records]
    images = load_images_bgr(paths, inp_res, workers)
    N = len(records)
    K = len(records[0]["kps"])
    kps = np.zeros((N, K, 3), np.float32)
    kps_test = np.zeros((N, K, 3), np.float32)
    islabeled = np.zeros((N,), np.int32)
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        sizes = list(ex.map(image_size, paths))
    for i, r in enumerate(records):
        w, h = sizes[i]
        kps[i] = _resize_kps(r["kps"], w, h, inp_res)
        kps_test[i] = _resize_kps(r["kps_test"], w, h, inp_res)
        islabeled[i] = int(r["islabeled"])
    return PoseArrays(images, kps, kps_test, islabeled,
                      [r["imageID"] for r in records])


def pad_to_multiple(arrays: PoseArrays, mult: int) -> PoseArrays:
    """Pad the sample axis to a multiple of `mult` (the 'data' mesh-axis size)
    so the arrays shard evenly.  Padding rows are never indexed: samplers draw
    from the real record count only."""
    if mult <= 1:
        return arrays
    n = arrays.images.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return arrays

    def padn(x):
        return np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

    return PoseArrays(padn(arrays.images), padn(arrays.kps),
                      padn(arrays.kps_test), padn(arrays.islabeled),
                      list(arrays.image_ids) + [""] * pad)
