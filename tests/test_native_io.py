"""Native C++ IO library tests: decode parity vs cv2 and batch throughput."""
import glob
import os

import numpy as np
import pytest

from ubpl_tpu.native import io_lib

MOUSE = "/root/reference/data/pose/mouse/croppeds_bbox/images"
HAVE_MOUSE = os.path.isdir(MOUSE)


@pytest.fixture(scope="module")
def nat():
    lib = io_lib.load()
    if lib is None:
        pytest.skip("libubpl_io.so not built (run ubpl_tpu/native/build.sh)")
    return lib


@pytest.mark.skipif(not HAVE_MOUSE, reason="mouse pngs not present")
def test_png_decode_matches_cv2(nat):
    import cv2
    paths = sorted(glob.glob(os.path.join(MOUSE, "*.png")))[:4]
    for p in paths:
        ours = nat.decode_png(p)           # RGB
        ref = cv2.imread(p)[..., ::-1]     # BGR -> RGB
        assert ours is not None
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.skipif(not HAVE_MOUSE, reason="mouse pngs not present")
def test_image_size(nat):
    import cv2
    p = sorted(glob.glob(os.path.join(MOUSE, "*.png")))[0]
    w, h = nat.image_size(p)
    ref = cv2.imread(p)
    assert (h, w) == ref.shape[:2]


@pytest.mark.skipif(not HAVE_MOUSE, reason="mouse pngs not present")
def test_batch_decode_resize(nat):
    import cv2
    paths = sorted(glob.glob(os.path.join(MOUSE, "*.png")))[:8]
    out, failures = nat.decode_resize_batch(paths, 256, n_threads=4)
    assert failures == 0
    assert out.shape == (8, 256, 256, 3)
    # vs cv2 resize: bilinear with the same pixel-center convention;
    # allow +-2 quantization difference
    ref = cv2.resize(cv2.imread(paths[0])[..., ::-1], (256, 256))
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert diff.max() <= 2
    assert (diff <= 1).mean() > 0.99


@pytest.mark.skipif(not HAVE_MOUSE, reason="mouse pngs not present")
def test_missing_file_fails_gracefully(nat):
    out, failures = nat.decode_resize_batch(["/nonexistent.png"], 64)
    assert failures == 1
    assert (out == 0).all()


@pytest.mark.skipif(not HAVE_MOUSE, reason="mouse pngs not present")
def test_load_images_bgr_uses_native(nat):
    from ubpl_tpu.data.arrays import load_images_bgr
    import cv2
    paths = sorted(glob.glob(os.path.join(MOUSE, "*.png")))[:3]
    imgs = load_images_bgr(paths, 256)
    ref = cv2.resize(cv2.imread(paths[0]), (256, 256))  # BGR
    diff = np.abs(imgs[0].astype(int) - ref.astype(int))
    assert diff.max() <= 2
