"""Host image IO with a native C++ fast path.

Decoding order of preference:
  1. libubpl_io.so (ubpl_tpu/native): threaded PNG decode + bilinear resize
  2. cv2 (what the reference uses — BGR uint8)
  3. PIL (RGB -> reversed to BGR for parity with the cv2 path)
"""
import os

import numpy as np

_CV2 = None
_NATIVE = None


def _cv2():
    global _CV2
    if _CV2 is None:
        import cv2
        _CV2 = cv2
    return _CV2


def _native():
    """Load the C++ IO library if built (ubpl_tpu/native/build.sh)."""
    global _NATIVE
    if _NATIVE is None:
        from ..native import io_lib
        _NATIVE = io_lib.load() or False
    return _NATIVE or None


def imread_bgr(path):
    nat = _native()
    if nat is not None and path.lower().endswith(".png"):
        img = nat.decode_png(path)
        if img is not None:
            return img[..., ::-1]  # native decodes RGB; reference order is BGR
    try:
        img = _cv2().imread(path)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        return img
    except ImportError:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"))
        return img[..., ::-1]


def imread_resize(path, inp_res):
    img = imread_bgr(path)
    if img.shape[0] == inp_res and img.shape[1] == inp_res:
        return np.ascontiguousarray(img)
    return _cv2().resize(img, (inp_res, inp_res))


def image_size(path):
    """(width, height) without a full decode when possible."""
    nat = _native()
    if nat is not None:
        wh = nat.image_size(path)
        if wh is not None:
            return wh
    from PIL import Image
    with Image.open(path) as im:
        return im.size
