"""Inference demo — the ``demo.ipynb`` walkthrough as a script.

Load a (COCO-class) Mask R-CNN, run detection on images, save a
display_instances composite per image. The reference's notebook also
demonstrates the template-match experiment, which lives in
samples/mask_image.py here.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("images", nargs="+", help="image files")
    p.add_argument("--weights", default=None)
    p.add_argument("--out", default="./detect_out")
    p.add_argument("--min-confidence", type=float, default=0.7)
    a = p.parse_args()

    import cv2

    from slam_maskrcnn_tpu.models import MaskRCNN
    from slam_maskrcnn_tpu.samples.coco import (COCO_CLASS_NAMES,
                                                CocoInferenceConfig)
    from slam_maskrcnn_tpu.viz import display_instances

    class Cfg(CocoInferenceConfig):
        DETECTION_MIN_CONFIDENCE = a.min_confidence

    model = MaskRCNN("inference", Cfg())
    if a.weights:
        model.load_weights(a.weights, by_name=True)
    else:
        print("WARNING: no --weights given; using random init "
              "(detections will be meaningless)")
        model.init_params()

    os.makedirs(a.out, exist_ok=True)
    for path in a.images:
        bgr = cv2.imread(path)
        if bgr is None:
            print(f"skip {path}: unreadable")
            continue
        rgb = np.ascontiguousarray(bgr[:, :, ::-1])
        r = model.detect([rgb], verbose=0)[0]
        out_path = os.path.join(
            a.out, os.path.splitext(os.path.basename(path))[0] + "_det.png")
        display_instances(rgb, r["rois"], r["masks"], r["class_ids"],
                          COCO_CLASS_NAMES, r["scores"], show=False,
                          save_path=out_path)
        names = [COCO_CLASS_NAMES[c] for c in r["class_ids"]]
        print(f"{path}: {len(names)} detections {names} -> {out_path}")


if __name__ == "__main__":
    main()
