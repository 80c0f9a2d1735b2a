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


def test_rle_to_bbox():
    from slam_maskrcnn_tpu.eval.rle import rle_to_bbox

    rng = np.random.default_rng(3)
    for _ in range(6):
        m = _rand_mask(rng, h=41, w=29, p=0.1)
        bb = rle_to_bbox(rle_encode(m))
        ys, xs = np.nonzero(m)
        if ys.size == 0:
            np.testing.assert_array_equal(bb, np.zeros(4))
            continue
        # a one-run spanning columns forces the full y extent (upstream
        # rleToBbox semantics) -- only check containment + x exactness
        assert bb[0] == xs.min() and bb[0] + bb[2] - 1 == xs.max()
        assert bb[1] <= ys.min() and bb[1] + bb[3] - 1 >= ys.max()
    # single-column runs: exact bbox
    m = np.zeros((20, 15), np.uint8)
    m[4:9, 3:7] = 1
    np.testing.assert_array_equal(rle_to_bbox(rle_encode(m)),
                                  [3.0, 4.0, 4.0, 5.0])
    # empty mask
    np.testing.assert_array_equal(
        rle_to_bbox(rle_encode(np.zeros((8, 8), np.uint8))), np.zeros(4))
    # full-height column run spanning columns
    m = np.ones((6, 4), np.uint8)
    np.testing.assert_array_equal(rle_to_bbox(rle_encode(m)),
                                  [0.0, 0.0, 4.0, 6.0])


def test_fr_py_objects():
    from slam_maskrcnn_tpu.eval.rle import fr_py_objects, rle_to_bbox

    h, w = 40, 60
    # bbox list -> rectangle masks
    rles = fr_py_objects([[5, 8, 10, 12]], h, w)
    m = rle_decode(rles[0])
    assert m.sum() == 10 * 12
    np.testing.assert_array_equal(rle_to_bbox(rles[0]), [5, 8, 10, 12])
    # ndarray of bboxes
    rles2 = fr_py_objects(np.array([[5.0, 8, 10, 12]]), h, w)
    np.testing.assert_array_equal(rle_decode(rles2[0]), m)
    # polygon (a rectangle drawn as polygon covers ~the same region)
    poly = [5, 8, 14, 8, 14, 19, 5, 19]
    rp = fr_py_objects([poly], h, w)[0]
    mp = rle_decode(rp)
    assert mp[10, 7] == 1 and mp[0, 0] == 0
    # uncompressed RLE dict passes through
    r = rle_encode(m)
    ru = fr_py_objects({"size": [h, w], "counts": list(r["counts"])}, h, w)
    np.testing.assert_array_equal(rle_decode(ru), m)
    # string counts accepted too
    rs = fr_py_objects({"size": [h, w],
                        "counts": counts_to_string(r["counts"])}, h, w)
    np.testing.assert_array_equal(rle_decode(rs), m)
