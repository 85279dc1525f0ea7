"""Synthetic-occlusion occluder bank (reference utils/udaap/utils_augment.py).

Harvests non-animal segmented objects from VOC2012 (RGBA patches with
border-softened alpha) into a fixed-shape device bank consumed by
ops.augment.composite_occluders.  When VOC2012 isn't present (this
environment has no downloads), a synthetic blob bank keeps the augmentation
path exercisable.
"""
import os
import xml.etree.ElementTree

import numpy as np

ANIMALish = {"cat", "dog", "cow", "horse", "sheep", "person"}


def harvest_voc_occluders(voc_root, min_pixels=500, downscale=0.5):
    """Reference load_occluders: segmented, non-animal objects as RGBA
    float32 patches in [0,1]; mask borders eroded to 192/255 opacity."""
    import cv2
    from PIL import Image
    occluders = []
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (8, 8))
    ann_dir = os.path.join(voc_root, "Annotations")
    for name in sorted(os.listdir(ann_dir)):
        root = xml.etree.ElementTree.parse(os.path.join(ann_dir, name)).getroot()
        if root.find("segmented").text == "0":
            continue
        boxes = []
        for i_obj, obj in enumerate(root.findall("object")):
            if obj.find("name").text in ANIMALish:
                continue
            bb = obj.find("bndbox")
            boxes.append((i_obj, [int(bb.find(s).text) for s in
                                  ("xmin", "ymin", "xmax", "ymax")]))
        if not boxes:
            continue
        im_name = root.find("filename").text
        im = np.asarray(Image.open(os.path.join(voc_root, "JPEGImages",
                                                im_name)))
        seg = np.asarray(Image.open(os.path.join(
            voc_root, "SegmentationObject", im_name.replace("jpg", "png"))))
        for i_obj, (xmin, ymin, xmax, ymax) in boxes:
            mask = (seg[ymin:ymax, xmin:xmax] == i_obj + 1).astype(np.uint8) * 255
            if cv2.countNonZero(mask) < min_pixels:
                continue
            eroded = cv2.erode(mask, se)
            mask[eroded < mask] = 192
            patch = np.concatenate([im[ymin:ymax, xmin:xmax],
                                    mask[..., None]], axis=-1)
            h, w = patch.shape[:2]
            patch = cv2.resize(patch, (max(int(w * downscale), 2),
                                       max(int(h * downscale), 2)))
            occluders.append(patch.astype(np.float32) / 255.0)
    return occluders


def synthetic_occluders(n=32, size=48, seed=0):
    """Random soft blobs standing in for VOC objects when data is absent."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    out = []
    for _ in range(n):
        color = rng.random(3).astype(np.float32)
        cx, cy = rng.uniform(size * 0.3, size * 0.7, 2)
        rx, ry = rng.uniform(size * 0.15, size * 0.45, 2)
        d = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2
        alpha = np.clip(1.5 - d, 0, 1).astype(np.float32)
        rgb = np.broadcast_to(color, (size, size, 3)).copy()
        out.append(np.concatenate([rgb, alpha[..., None]], -1))
    return out


def build_occluder_bank(occluders=None, bank_size=64, patch_res=64,
                        voc_root=None, seed=0):
    """Pad/resize harvested occluders into fixed-shape device tensors:
    (rgb [N, patch_res, patch_res, 3], alpha [N, patch_res, patch_res])."""
    import cv2
    if occluders is None:
        if voc_root and os.path.isdir(voc_root):
            occluders = harvest_voc_occluders(voc_root)
        else:
            occluders = synthetic_occluders(bank_size, patch_res, seed)
    rng = np.random.default_rng(seed)
    if len(occluders) > bank_size:
        sel = rng.choice(len(occluders), bank_size, replace=False)
        occluders = [occluders[i] for i in sel]
    rgb = np.zeros((bank_size, patch_res, patch_res, 3), np.float32)
    alpha = np.zeros((bank_size, patch_res, patch_res), np.float32)
    for i, occ in enumerate(occluders[:bank_size]):
        resized = cv2.resize(occ, (patch_res, patch_res))
        rgb[i] = resized[..., :3]
        alpha[i] = resized[..., 3]
    return rgb, alpha
