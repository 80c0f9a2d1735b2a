"""Device-side label encoding (label_masks_device) vs the host dmask path."""

import numpy as np
import jax.numpy as jnp

from slam_maskrcnn_tpu.models.mask_ops import (filter_tiny_objects,
                                               label_masks_device,
                                               preserve_small_objs)
from slam_maskrcnn_tpu.models.mask_rcnn import unmold_mask

H, W = 120, 160


def _host_labels(detections, masks28, min_area):
    """The host pipeline: unmold -> tiny filter -> small-preserve ->
    label encode (mask_ops.mask_detect structure, depth filter off)."""
    n = int((detections[:, 4] > 0).sum())
    oscale = np.array([H - 1, W - 1, H - 1, W - 1], np.float32)
    shift = np.array([0, 0, 1, 1], np.float32)
    stack = []
    for i in range(n):
        bpx = np.round(detections[i, :4] * oscale + shift).astype(np.int32)
        if bpx[2] <= bpx[0] or bpx[3] <= bpx[1]:
            continue
        stack.append(unmold_mask(masks28[i], bpx, (H, W)))
    masks = (np.stack(stack, -1) if stack
             else np.zeros((H, W, 0), bool))
    masks = filter_tiny_objects(masks, min_area=min_area)
    masks = preserve_small_objs(masks)
    cls = np.zeros((H, W), np.uint8)
    for i in range(masks.shape[2]):
        cls[masks[:, :, i]] = i + 1
    return cls


def _fixture():
    D = 8
    dets = np.zeros((D, 6), np.float32)
    masks = np.zeros((D, 28, 28), np.uint8)

    def disk(r=10.0, c=(14, 14)):
        yy, xx = np.mgrid[:28, :28]
        return (((yy - c[0]) ** 2 + (xx - c[1]) ** 2) <= r * r)

    # det 0: big box; det 1: smaller box overlapping det 0 (must win the
    # overlap); det 2: tiny (filtered); rest padding (class 0)
    dets[0] = [0.10, 0.10, 0.70, 0.70, 5, 0.9]
    masks[0] = disk(12) * 255
    dets[1] = [0.30, 0.30, 0.60, 0.60, 3, 0.8]
    masks[1] = disk(12) * 255
    dets[2] = [0.05, 0.80, 0.12, 0.90, 2, 0.7]
    masks[2] = disk(12) * 255
    return jnp.asarray(dets), jnp.asarray(masks)


def test_label_masks_device_matches_host():
    dets, masks = _fixture()
    window = jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
    dev = np.asarray(label_masks_device(dets, masks, window, (H, W),
                                        min_area=200))
    host = _host_labels(np.asarray(dets), np.asarray(masks), 200)

    assert set(np.unique(host)) == set(np.unique(dev))
    # the tiny det was filtered on both paths
    assert host.max() == 2 and dev.max() == 2
    # boundary pixels may differ by the cv2-vs-hat resize rounding;
    # interiors must agree
    mismatch = (dev != host).mean()
    assert mismatch < 0.01, f"label mismatch fraction {mismatch:.4f}"
    # the smaller (later) detection keeps the overlap on both paths
    inter = (host == 2) & (dev == 2)
    assert inter.sum() > 100


def test_label_masks_device_empty():
    dets = jnp.zeros((4, 6), jnp.float32)
    masks = jnp.zeros((4, 28, 28), jnp.uint8)
    window = jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
    out = np.asarray(label_masks_device(dets, masks, window, (H, W)))
    assert (out == 0).all()
