"""Visual debug dumps (reference draw_point / _draw_testImage / debug regions).

Writes each augmentation stage and affine-back reconstruction as annotated
images under {base_path}/draw/... when debug is enabled — matching the
reference's visual test surface (datasets/dataset.py:77-139,
projects/MT.py:184-223).
"""
import os

import numpy as np


def _cv2():
    import cv2
    return cv2


def draw_point(img, coord, color=(0, 95, 191), radius=3, thickness=-1,
               text=None, text_scale=1.0, text_color=(255, 255, 255)):
    """Reference ProcessUtils.draw_point."""
    cv2 = _cv2()
    img = np.ascontiguousarray(img.astype(np.uint8))
    x, y = int(round(float(coord[0]))), int(round(float(coord[1])))
    if x > 1 and y > 1:
        cv2.circle(img, (x, y), color=color, radius=radius,
                   thickness=thickness)
        if text is not None:
            cv2.putText(img, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX,
                        text_scale, text_color, 2)
    return img


def save_image(img, pathname, compression=0):
    cv2 = _cv2()
    os.makedirs(os.path.dirname(os.path.abspath(pathname)), exist_ok=True)
    cv2.imwrite(pathname, img.astype(np.uint8),
                [cv2.IMWRITE_PNG_COMPRESSION, compression])


def draw_kps_image(image01, kps, pck_ref=()):
    """Annotate an [H, W, 3] image in [0,1] with keypoints (vis-gated)."""
    img = (np.asarray(image01) * 255).astype(np.uint8)
    for k_idx, kp in enumerate(np.asarray(kps)):
        if len(kp) < 3 or kp[2] > 0:
            color = (255, 0, 0) if k_idx in tuple(pck_ref) else (0, 95, 191)
            img = draw_point(img, kp[:2], color=color)
    return img


class DebugDrawer:
    """Stage-by-stage augmentation dumps (reference _draw_testImage)."""

    def __init__(self, base_path, ds_type="train", img_type="png"):
        self.base = os.path.join(base_path, "draw", "dataset", ds_type)
        self.img_type = img_type

    def stage(self, image_id, step_id, image01, kps=None):
        img = (np.asarray(image01) * 255).astype(np.uint8)
        if kps is not None:
            img = draw_kps_image(np.asarray(image01), kps)
        save_image(img, os.path.join(
            self.base, f"{image_id}_{step_id}.{self.img_type}"))

    def dump_view(self, image_ids, view, prefix=""):
        """Dump a whole augmented ViewBatch (train.common.ViewBatch)."""
        import jax.numpy as jnp  # noqa: F401
        images = np.asarray(view.images)
        kps = np.asarray(view.kps)
        for i, image_id in enumerate(image_ids):
            self.stage(image_id, prefix + "aug", images[i], kps[i])
            hm = np.asarray(view.heatmaps[i]).max(-1)
            hm_img = np.repeat((hm / max(hm.max(), 1e-6))[..., None], 3, -1)
            self.stage(image_id, prefix + "heatmap", hm_img)
