"""Ops tests: NMS vs the reference's own pure-numpy oracle
(Mask_RCNN/mrcnn/utils.py:116-150 semantics), crop_and_resize vs a loop
oracle with tf.image.crop_and_resize semantics, box ops roundtrips."""

import numpy as np
import jax.numpy as jnp

from slam_maskrcnn_tpu.ops import (apply_box_deltas, box_refinement,
                                   clip_boxes, compute_iou_matrix,
                                   crop_and_resize, denorm_boxes, norm_boxes,
                                   non_max_suppression, pyramid_roi_align)
from slam_maskrcnn_tpu.ops.roi_align import roi_level


def nms_ref(boxes, scores, threshold, max_out):
    """Greedy numpy NMS (reference utils.py:116-150 semantics)."""
    ixs = scores.argsort()[::-1]
    pick = []
    while len(ixs) > 0 and len(pick) < max_out:
        i = ixs[0]
        pick.append(i)
        y1 = np.maximum(boxes[i, 0], boxes[ixs[1:], 0])
        x1 = np.maximum(boxes[i, 1], boxes[ixs[1:], 1])
        y2 = np.minimum(boxes[i, 2], boxes[ixs[1:], 2])
        x2 = np.minimum(boxes[i, 3], boxes[ixs[1:], 3])
        inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = ((boxes[ixs[1:], 2] - boxes[ixs[1:], 0])
             * (boxes[ixs[1:], 3] - boxes[ixs[1:], 1]))
        iou = inter / np.maximum(a + b - inter, 1e-10)
        ixs = ixs[1:][iou <= threshold]
    return np.array(pick)


def _rand_boxes(rng, n):
    y1 = rng.uniform(0, 0.8, n)
    x1 = rng.uniform(0, 0.8, n)
    h = rng.uniform(0.05, 0.3, n)
    w = rng.uniform(0.05, 0.3, n)
    return np.stack([y1, x1, y1 + h, x1 + w], -1).astype(np.float32)


def test_nms_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        boxes = _rand_boxes(rng, 64)
        scores = rng.uniform(size=64).astype(np.float32)
        idx, valid = non_max_suppression(jnp.asarray(boxes),
                                         jnp.asarray(scores), 20, 0.4)
        got = np.asarray(idx)[np.asarray(valid)]
        want = nms_ref(boxes, scores, 0.4, 20)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_iou_matrix_symmetry_and_values():
    a = np.array([[0, 0, 1, 1], [0.5, 0.5, 1.5, 1.5]], np.float32)
    iou = np.asarray(compute_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 0.25 / 1.75, atol=1e-6)


def test_box_deltas_roundtrip():
    rng = np.random.default_rng(1)
    src = _rand_boxes(rng, 16)
    dst = _rand_boxes(rng, 16)
    d = box_refinement(jnp.asarray(src), jnp.asarray(dst))
    rec = np.asarray(apply_box_deltas(jnp.asarray(src), d))
    np.testing.assert_allclose(rec, dst, atol=1e-5)


def test_norm_denorm_roundtrip():
    boxes = np.array([[10, 20, 100, 200], [0, 0, 479, 639]], np.float32)
    n = norm_boxes(jnp.asarray(boxes), (480, 640))
    d = np.asarray(denorm_boxes(n, (480, 640)))
    np.testing.assert_array_equal(d, boxes.astype(np.int32))


def crop_resize_ref(image, boxes, crop):
    """Loop oracle with tf.image.crop_and_resize bilinear semantics."""
    H, W, C = image.shape
    ch, cw = crop
    out = np.zeros((len(boxes), ch, cw, C), np.float32)
    for b, (y1, x1, y2, x2) in enumerate(boxes):
        for i in range(ch):
            for j in range(cw):
                y = y1 * (H - 1) + i * (y2 - y1) * (H - 1) / (ch - 1)
                x = x1 * (W - 1) + j * (x2 - x1) * (W - 1) / (cw - 1)
                if y < 0 or y > H - 1 or x < 0 or x > W - 1:
                    continue
                y0, x0 = int(np.floor(y)), int(np.floor(x))
                y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                dy, dx = y - y0, x - x0
                top = image[y0, x0] * (1 - dx) + image[y0, x1i] * dx
                bot = image[y1i, x0] * (1 - dx) + image[y1i, x1i] * dx
                out[b, i, j] = top * (1 - dy) + bot * dy
    return out


def test_crop_and_resize_matches_oracle():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(24, 32, 3)).astype(np.float32)
    boxes = np.array([[0.1, 0.2, 0.6, 0.9],
                      [0.0, 0.0, 1.0, 1.0],
                      [-0.1, 0.3, 0.5, 1.2]], np.float32)  # partly OOB
    got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes),
                                     (7, 7)))
    want = crop_resize_ref(img, boxes, (7, 7))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_level_routing():
    # tiny box -> P2, full-image box -> P5 (at 1024x1024, rule model.py:375-384)
    boxes = np.array([[0.0, 0.0, 0.02, 0.02],
                      [0.0, 0.0, 1.0, 1.0]], np.float32)
    lvl = np.asarray(roi_level(jnp.asarray(boxes), (1024, 1024)))
    assert lvl[0] == 2 and lvl[1] == 5


def test_pyramid_roi_align_selects_level():
    rng = np.random.default_rng(3)
    feats = tuple(jnp.asarray(rng.normal(size=(s, s, 8)).astype(np.float32))
                  for s in (64, 32, 16, 8))
    boxes = np.array([[0.0, 0.0, 0.02, 0.02],
                      [0.1, 0.1, 0.9, 0.9]], np.float32)
    out = pyramid_roi_align(feats, jnp.asarray(boxes), 7, (1024, 1024))
    assert out.shape == (2, 7, 7, 8)
    # box 0 routed to P2, box 1 to P5 — check against direct crops
    w0 = np.asarray(crop_and_resize(feats[0], jnp.asarray(boxes[:1]), (7, 7)))
    np.testing.assert_allclose(np.asarray(out[0]), w0[0], rtol=1e-4, atol=1e-5)
    w1 = np.asarray(crop_and_resize(feats[3], jnp.asarray(boxes[1:]), (7, 7)))
    np.testing.assert_allclose(np.asarray(out[1]), w1[0], rtol=1e-4, atol=1e-5)


def test_pallas_nms_matches_reference():
    from slam_maskrcnn_tpu.ops.pallas.nms_kernel import non_max_suppression_pallas

    rng = np.random.default_rng(7)
    for trial in range(3):
        boxes = _rand_boxes(rng, 100)
        scores = rng.uniform(size=100).astype(np.float32)
        idx, valid = non_max_suppression_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), 20, 0.4)
        got = np.asarray(idx)[np.asarray(valid)]
        want = nms_ref(boxes, scores, 0.4, 20)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_pallas_nms_sorted_matches_argmax_variant():
    """The sort+tiled-scan kernel and the per-selection argmax kernel must
    produce identical selections (both greedy by score)."""
    from slam_maskrcnn_tpu.ops.pallas.nms_kernel import (
        non_max_suppression_pallas)

    rng = np.random.default_rng(11)
    for n, cap in ((300, 40), (513, 100)):
        boxes = _rand_boxes(rng, n)
        scores = rng.uniform(size=n).astype(np.float32)
        i1, v1 = non_max_suppression_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), cap, 0.5,
            variant="sorted")
        i2, v2 = non_max_suppression_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), cap, 0.5,
            variant="argmax")
        np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                      np.asarray(i2)[np.asarray(v2)])
