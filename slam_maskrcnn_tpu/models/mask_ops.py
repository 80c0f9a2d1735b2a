"""Mask post-processing: detection masks -> label-encoded instance image.

= ``Mask_RCNN/dmask.py`` (the stage-1/stage-2 pipeline contract: mask PNG
with pixel value = instance id, 0 = background, ``dmask.py:47-59``).
Host-side numpy — these run on [H, W, N] boolean stacks from detect().
"""

from __future__ import annotations

import numpy as np


def depth_filter(depth_image: np.ndarray, masks: np.ndarray,
                 n_std: float = 5.0) -> np.ndarray:
    """Zero mask pixels whose depth deviates more than n_std sigma from the
    mask's median depth (``dmask.py:3-19``)."""
    new_masks = masks.copy()
    for i in range(masks.shape[2]):
        sel = masks[:, :, i]
        if not sel.any():
            continue
        median = np.median(depth_image[sel])
        std = np.std(depth_image[sel])
        bad = (depth_image < median - n_std * std) | \
              (depth_image > median + n_std * std)
        new_masks[:, :, i][bad] = False
    return new_masks


def preserve_small_objs(masks: np.ndarray) -> np.ndarray:
    """Resolve overlaps in favor of smaller masks (``dmask.py:21-32``):
    area-ascending pairwise subtraction."""
    areas = np.array([np.count_nonzero(masks[:, :, i])
                      for i in range(masks.shape[-1])])
    order = np.argsort(areas)
    for a in range(len(order)):
        for b in range(a + 1, len(order)):
            inter = masks[:, :, order[a]] & masks[:, :, order[b]]
            if inter.any():
                masks[:, :, order[b]][inter] = False
    return masks


def filter_tiny_objects(masks: np.ndarray, min_area: int = 2000) -> np.ndarray:
    """Drop masks with area <= min_area px (``dmask.py:34-45``; note the
    reference keeps area > 2000 strictly)."""
    keep = [i for i in range(masks.shape[-1])
            if np.count_nonzero(masks[:, :, i]) > min_area]
    return masks[:, :, keep]


def mask_detect(model, rgb_image: np.ndarray,
                depth_image: np.ndarray | None = None,
                noise_remove: bool = True) -> np.ndarray:
    """detect -> filter -> label-encode (``dmask.py:47-59``). Returns
    uint8 [H, W] with instance i's pixels = i+1."""
    result = model.detect([rgb_image], verbose=0)[0]
    masks = result["masks"].astype(bool)
    if depth_image is not None:
        masks = depth_filter(depth_image, masks)
    if noise_remove:
        masks = filter_tiny_objects(masks)
    masks = preserve_small_objs(masks)
    cls = np.zeros(rgb_image.shape[:2], np.uint8)
    for i in range(masks.shape[2]):
        cls[masks[:, :, i]] = i + 1
    return cls


def batch_mask_process(model, rgb_dir: str, mask_dir: str,
                       depth_dir: str | None = None, verbose: bool = True):
    """The ``mask_process.py`` batch driver (``mask_process.py:94-105``):
    loop sorted rgb/*.png -> mask_detect -> write mask/<same name>.png."""
    import glob
    import os

    import cv2

    os.makedirs(mask_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(rgb_dir, "*.png"))) or \
        sorted(glob.glob(os.path.join(rgb_dir, "*.jpg")))
    for k, f in enumerate(files):
        rgb = cv2.imread(f)[:, :, ::-1]  # BGR -> RGB for the model
        depth = None
        if depth_dir is not None:
            dfile = os.path.join(depth_dir, os.path.basename(f))
            if os.path.exists(dfile):
                depth = cv2.imread(dfile, cv2.IMREAD_ANYDEPTH)
        cls = mask_detect(model, np.ascontiguousarray(rgb), depth)
        out = os.path.join(mask_dir, os.path.splitext(os.path.basename(f))[0]
                           + ".png")
        cv2.imwrite(out, cls)
        if verbose:
            print(f"[{k + 1}/{len(files)}] {out} ({cls.max()} instances)")
    return len(files)
