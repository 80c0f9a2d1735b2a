"""Mini-COCO protocol harness (samples/mini_coco.py): generated COCO tree
-> CocoDataset -> COCOevalLite bbox/segm + compute_ap cross-check, with
synthetic predictions standing in for a trained model."""

import numpy as np

from slam_maskrcnn_tpu.samples.coco import CocoDataset
from slam_maskrcnn_tpu.samples.mini_coco import (make_mini_coco,
                                                 run_protocol)


def _perfect_result(ds, image_id, rng):
    """Predictions = ground truth with jittered scores (AP should be 1)."""
    from slam_maskrcnn_tpu.data.dataset import extract_bboxes

    masks, ids = ds.load_mask(image_id)
    boxes = extract_bboxes(masks).astype(np.float32)
    return {"rois": boxes, "class_ids": np.abs(ids),
            "scores": 0.8 + 0.2 * rng.random(len(ids)),
            "masks": masks}


def test_mini_coco_protocol(tmp_path):
    path = make_mini_coco(str(tmp_path), n_images=12, size=96)
    assert path.endswith("instances_val2014.json")

    ds = CocoDataset()
    ds.load_coco(str(tmp_path), "val", "2014")
    ds.prepare()
    assert ds.num_images == 12
    assert ds.class_names[1:] == ["square", "circle", "triangle"]
    # masks decode from the written RLE JSON
    masks, ids = ds.load_mask(0)
    assert masks.ndim == 3 and masks.shape[:2] == (96, 96)
    assert masks.any() and ids.min() >= 1

    rng = np.random.default_rng(0)
    stats = run_protocol(ds, lambda i: _perfect_result(ds, i, rng),
                         verbose=False)
    # perfect predictions: AP = 1 under both protocols, bbox and segm
    assert stats["compute_ap50_mean"] == 1.0
    assert stats["cocoeval_ap50_bbox"] > 0.99
    assert stats["segm"]["ap50"] > 0.99
    assert stats["bbox"]["ap"] > 0.99  # AP@[.5:.95] too — exact masks


def test_mini_coco_degraded_predictions(tmp_path):
    """Dropping half the instances halves recall — both protocols move
    together (the cross-check VERDICT asked for)."""
    make_mini_coco(str(tmp_path), n_images=10, size=96, seed=3)
    ds = CocoDataset()
    ds.load_coco(str(tmp_path), "val", "2014")
    ds.prepare()

    rng = np.random.default_rng(1)

    def degraded(image_id):
        r = _perfect_result(ds, image_id, rng)
        keep = slice(0, max(1, len(r["class_ids"]) // 2))
        cls = r["class_ids"][keep].copy()
        if image_id == 0:
            # one wrong-class detection: exercises the (detections, no GT
            # of that class) path in COCOevalLite (regression: an empty
            # g_ig defaulted to float64 and ~ raised)
            cls[0] = 1 + (cls[0] % 3)
        return {"rois": r["rois"][keep], "class_ids": cls,
                "scores": r["scores"][keep],
                "masks": r["masks"][:, :, keep]}

    stats = run_protocol(ds, degraded, verbose=False)
    assert 0.2 < stats["cocoeval_ap50_bbox"] < 0.95
    assert abs(stats["compute_ap50_mean"]
               - stats["cocoeval_ap50_bbox"]) < 0.25
