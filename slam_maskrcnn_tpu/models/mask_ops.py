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


def label_masks_device(detections, masks_u8, window_norm, out_shape,
                       min_area: int = 2000):
    """Device-side dmask: detections -> label-encoded [H, W] uint8, jitted.

    The host path (mask_detect) pastes every instance's 28x28 mask at full
    resolution per frame (the reference's unmold + dmask loops) — fine
    offline, the wrong thing in a 30 fps streaming loop. This computes the
    same label image on device: the 28->box bilinear paste is SEPARABLE
    (full_d = Wy_d @ m_d @ Wx_d^T, two small matmuls per instance — hat
    weights with cv2.INTER_LINEAR's half-pixel convention and border
    clamp), tiny masks (area <= min_area) drop, and overlaps resolve in
    favor of the smaller mask (dmask.py:21-45 semantics; the smallest
    covering mask wins every pixel, ties to the earlier detection). Labels
    are kept-list positions + 1, as the host path. Depth filtering
    (dmask.py:3-19) needs per-mask medians — use the host path for that.

    detections: [D, 6] molded-normalized (y1,x1,y2,x2,class,score);
    masks_u8: [D, 28, 28] uint8 (device-quantized); window_norm: [4]
    normalized window in the molded image; out_shape: (oh, ow).
    """
    import jax.numpy as jnp

    D, S = masks_u8.shape[0], masks_u8.shape[1]
    oh, ow = int(out_shape[0]), int(out_shape[1])
    wy1, wx1, wy2, wx2 = (window_norm[0], window_norm[1], window_norm[2],
                          window_norm[3])
    shift = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    wscale = jnp.stack([wy2 - wy1, wx2 - wx1, wy2 - wy1, wx2 - wx1])
    woff = jnp.stack([wy1, wx1, wy1, wx1])
    boxes = (detections[:, :4] - woff) / wscale
    oscale = jnp.asarray([oh - 1, ow - 1, oh - 1, ow - 1], jnp.float32)
    bpx = jnp.round(boxes * oscale + shift).astype(jnp.int32)  # unmold's px
    y1, x1, y2, x2 = bpx[:, 0], bpx[:, 1], bpx[:, 2], bpx[:, 3]
    valid = ((detections[:, 4] > 0) & (y2 > y1) & (x2 > x1))

    def axis_weights(lo, hi, n_out):
        """[D, n_out, S] hat weights of cv2 INTER_LINEAR at integer output
        coords lo..hi-1 (zero outside the box)."""
        coords = jnp.arange(n_out, dtype=jnp.float32)[None, :]
        size = jnp.maximum((hi - lo).astype(jnp.float32), 1.0)[:, None]
        src = (coords - lo[:, None].astype(jnp.float32) + 0.5) * (S / size) - 0.5
        src = jnp.clip(src, 0.0, S - 1.0)
        sidx = jnp.arange(S, dtype=jnp.float32)[None, None, :]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - sidx))
        inside = ((coords >= lo[:, None]) & (coords < hi[:, None]))
        return w * inside[..., None]

    wy = axis_weights(y1, y2, oh)                       # [D, oh, S]
    wx = axis_weights(x1, x2, ow)                       # [D, ow, S]
    m = masks_u8.astype(jnp.float32) / 255.0
    full = jnp.einsum("dyp,dpq,dxq->dyx", wy, m, wx)    # [D, oh, ow]
    cover = (full >= 0.5) & valid[:, None, None]

    area = cover.sum(axis=(1, 2))
    kept = valid & (area > min_area)
    label_of = jnp.cumsum(kept.astype(jnp.int32))       # kept-list pos + 1
    big = jnp.int32(2 ** 30)
    d_i = jnp.arange(D, dtype=jnp.int32)
    key = jnp.where(cover & kept[:, None, None],
                    area.astype(jnp.int32)[:, None, None] * 512
                    + d_i[:, None, None], big)
    win = jnp.argmin(key, axis=0)
    any_cover = key.min(axis=0) < big
    return jnp.where(any_cover, label_of[win], 0).astype(jnp.uint8)


def mask_detect_device(model, rgb_image: np.ndarray,
                       min_area: int = 2000) -> np.ndarray:
    """mask_detect's streaming-fast variant: the whole detect -> label
    encode runs on device; only the final [H, W] uint8 crosses back."""
    import jax
    import jax.numpy as jnp

    from slam_maskrcnn_tpu.models.anchors import get_anchors

    molded, windows = model.mold_inputs([rgb_image])
    H, W = molded.shape[1:3]
    if model._anchors_dev is None:
        model._anchors_dev = jnp.asarray(
            get_anchors(model.config, molded.shape[1:]))
    scale = np.array([H - 1, W - 1, H - 1, W - 1], np.float32)
    shift = np.array([0, 0, 1, 1], np.float32)
    norm_windows = (windows.astype(np.float32) - shift) / scale

    key = (rgb_image.shape[:2], min_area)
    cache = getattr(model, "_label_fns", None)
    if cache is None:
        cache = model._label_fns = {}
    if key not in cache:
        out_shape = rgb_image.shape[:2]

        @jax.jit
        def run(params, images, anchors, win):
            out = model.module.apply(params, images, anchors, win)
            return label_masks_device(out["detections"][0], out["masks"][0],
                                      win[0], out_shape, min_area=min_area)

        cache[key] = run

    return np.asarray(cache[key](model.params, jnp.asarray(molded),
                                 model._anchors_dev,
                                 jnp.asarray(norm_windows)))


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
