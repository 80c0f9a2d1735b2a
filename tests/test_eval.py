"""Eval tests: RLE codec roundtrips (native vs numpy agreement, COCO string
form), mAP metrics sanity."""

import numpy as np
import pytest

from slam_maskrcnn_tpu.eval import (compute_ap, compute_ap_range,
                                    compute_recall, mask_to_rle_string,
                                    rle_area, rle_decode, rle_encode,
                                    rle_iou, rle_merge)
from slam_maskrcnn_tpu.eval import rle as rle_mod
from slam_maskrcnn_tpu.eval.rle import counts_to_string, string_to_counts


def _rand_mask(rng, h=37, w=53, p=0.3):
    return (rng.random((h, w)) < p).astype(np.uint8)


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = _rand_mask(rng)
        r = rle_encode(m)
        np.testing.assert_array_equal(rle_decode(r), m)
        assert rle_area(r) == m.sum()


def test_rle_native_loaded():
    # the C++ core should build in this environment
    assert rle_mod._native() is not None


def test_rle_native_matches_numpy():
    rng = np.random.default_rng(1)
    m = _rand_mask(rng)
    r_native = rle_encode(m)
    # force numpy fallback
    old = rle_mod._LIB, rle_mod._LIB_TRIED
    rle_mod._LIB, rle_mod._LIB_TRIED = None, True
    try:
        r_np = rle_encode(m)
        np.testing.assert_array_equal(r_native["counts"], r_np["counts"])
        np.testing.assert_array_equal(rle_decode(r_native), m)
    finally:
        rle_mod._LIB, rle_mod._LIB_TRIED = old


def test_rle_merge_and_iou():
    rng = np.random.default_rng(2)
    m1 = _rand_mask(rng)
    m2 = _rand_mask(rng)
    r1, r2 = rle_encode(m1), rle_encode(m2)
    u = rle_decode(rle_merge([r1, r2]))
    np.testing.assert_array_equal(u, m1 | m2)
    i = rle_decode(rle_merge([r1, r2], intersect=True))
    np.testing.assert_array_equal(i, m1 & m2)
    iou = rle_iou([r1], [r2])[0, 0]
    want = (m1 & m2).sum() / (m1 | m2).sum()
    assert abs(iou - want) < 1e-9
    # crowd semantics: denominator is det area
    iou_c = rle_iou([r1], [r2], iscrowd=[True])[0, 0]
    assert abs(iou_c - (m1 & m2).sum() / m1.sum()) < 1e-9


def test_rle_string_roundtrip():
    rng = np.random.default_rng(3)
    m = _rand_mask(rng)
    r = rle_encode(m)
    s = counts_to_string(r["counts"])
    back = string_to_counts(s)
    np.testing.assert_array_equal(back, r["counts"])
    rs = mask_to_rle_string(m)
    assert isinstance(rs["counts"], str)


def _boxes_from_masks(masks):
    out = []
    for i in range(masks.shape[-1]):
        ys, xs = np.nonzero(masks[:, :, i])
        out.append([ys.min(), xs.min(), ys.max() + 1, xs.max() + 1])
    return np.array(out, np.float32)


def test_compute_ap_perfect_and_miss():
    H, W = 40, 40
    gt = np.zeros((H, W, 2), bool)
    gt[5:15, 5:15, 0] = True
    gt[25:35, 25:35, 1] = True
    gt_boxes = _boxes_from_masks(gt)
    gt_ids = np.array([1, 2])
    # perfect predictions
    ap, prec, rec, _ = compute_ap(gt_boxes, gt_ids, gt,
                                  gt_boxes, gt_ids, np.array([0.9, 0.8]), gt)
    assert ap == 1.0
    # one wrong class
    ap2, _, _, _ = compute_ap(gt_boxes, gt_ids, gt,
                              gt_boxes, np.array([1, 1]),
                              np.array([0.9, 0.8]), gt)
    assert ap2 < 1.0
    # ap range runs
    apr = compute_ap_range(gt_boxes, gt_ids, gt, gt_boxes, gt_ids,
                           np.array([0.9, 0.8]), gt)
    assert 0.99 < apr <= 1.0


def test_compute_recall():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    pred = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    recall, pos = compute_recall(pred, gt, 0.5)
    assert recall == 0.5


def test_cocoeval_lite_perfect_and_degraded():
    from slam_maskrcnn_tpu.eval.cocoeval import COCOevalLite

    # two images, two classes; perfect detections -> AP = 1
    gts, dts = [], []
    rng = np.random.default_rng(0)
    for img in (1, 2):
        for k in range(3):
            y1, x1 = rng.uniform(0, 50, 2)
            h, w = rng.uniform(20, 60, 2)
            box = [y1, x1, y1 + h, x1 + w]
            cls = 1 + k % 2
            gts.append(dict(image_id=img, class_id=cls, bbox=box,
                            area=h * w, iscrowd=0))
            dts.append(dict(image_id=img, class_id=cls, bbox=box,
                            area=h * w, score=0.9 - 0.1 * k))
    ev = COCOevalLite(gts, dts, iou_type="bbox")
    ev.evaluate()
    assert abs(ev.stats[("all", 100)]["ap"] - 1.0) < 1e-6
    lines = ev.summarize(out=lambda s: None)
    assert len(lines) == 12

    # drop half the detections -> AP decreases
    ev2 = COCOevalLite(gts, dts[::2], iou_type="bbox")
    ev2.evaluate()
    assert ev2.stats[("all", 100)]["ap"] < 1.0


def test_cocoeval_lite_segm():
    from slam_maskrcnn_tpu.eval.cocoeval import COCOevalLite
    from slam_maskrcnn_tpu.eval.rle import rle_encode

    m1 = np.zeros((40, 40), np.uint8)
    m1[5:20, 5:20] = 1
    m2 = np.zeros((40, 40), np.uint8)
    m2[22:35, 22:35] = 1
    gts = [dict(image_id=1, class_id=1, rle=rle_encode(m1),
                area=float(m1.sum()), iscrowd=0),
           dict(image_id=1, class_id=1, rle=rle_encode(m2),
                area=float(m2.sum()), iscrowd=0)]
    dts = [dict(image_id=1, class_id=1, rle=rle_encode(m1),
                area=float(m1.sum()), score=0.9),
           dict(image_id=1, class_id=1, rle=rle_encode(m2),
                area=float(m2.sum()), score=0.8)]
    ev = COCOevalLite(gts, dts, iou_type="segm")
    ev.evaluate()
    assert abs(ev.stats[("all", 100)]["ap"] - 1.0) < 1e-6
