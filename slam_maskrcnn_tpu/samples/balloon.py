"""Balloon sample: single-class fine-tune + color-splash effect.

= ``Mask_RCNN/samples/balloon/balloon.py``: BalloonConfig (:39-63),
BalloonDataset over the VIA polygon JSON (:66-139), ``color_splash``
(:141-157) and ``detect_and_color_splash`` for images and video
(:160-207), train/splash CLI.
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np

from slam_maskrcnn_tpu.data.dataset import Dataset
from slam_maskrcnn_tpu.models.config import Config


class BalloonConfig(Config):
    NAME = "balloon"
    IMAGES_PER_GPU = 2
    NUM_CLASSES = 1 + 1
    STEPS_PER_EPOCH = 100
    DETECTION_MIN_CONFIDENCE = 0.9


class BalloonDataset(Dataset):
    def load_balloon(self, dataset_dir, subset):
        """VIA-format polygon annotations (balloon.py:78-139)."""
        assert subset in ("train", "val")
        self.add_class("balloon", 1, "balloon")
        dataset_dir = os.path.join(dataset_dir, subset)
        ann = json.load(open(os.path.join(dataset_dir,
                                          "via_region_data.json")))
        for a in ann.values():
            if not a.get("regions"):
                continue
            regions = (a["regions"].values()
                       if isinstance(a["regions"], dict) else a["regions"])
            polygons = [r["shape_attributes"] for r in regions]
            path = os.path.join(dataset_dir, a["filename"])
            import cv2

            img = cv2.imread(path)
            h, w = img.shape[:2]
            self.add_image("balloon", image_id=a["filename"], path=path,
                           width=w, height=h, polygons=polygons)

    def load_mask(self, image_id):
        import cv2

        info = self.image_info[image_id]
        if info["source"] != "balloon":
            return super().load_mask(image_id)
        masks = np.zeros([info["height"], info["width"],
                          len(info["polygons"])], np.uint8)
        for i, p in enumerate(info["polygons"]):
            pts = np.stack([p["all_points_x"], p["all_points_y"]],
                           -1).astype(np.int32)
            cv2.fillPoly(masks[:, :, i], [pts], 1)
        ids = np.ones(masks.shape[-1], np.int32)
        return masks.astype(bool), ids

    def image_reference(self, image_id):
        info = self.image_info[image_id]
        return info["path"] if info["source"] == "balloon" else ""


def color_splash(image, mask):
    """Color where any instance, grayscale elsewhere (balloon.py:141-157)."""
    import cv2

    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)[..., None]
    gray = np.repeat(gray, 3, axis=-1)
    if mask.shape[-1] > 0:
        keep = mask.any(-1, keepdims=True)
        return np.where(keep, image, gray).astype(np.uint8)
    return gray.astype(np.uint8)


def detect_and_color_splash(model, image_path=None, video_path=None,
                            out_dir="."):
    """= balloon.py:160-207 (image or video)."""
    import cv2

    assert image_path or video_path
    if image_path:
        image = cv2.imread(image_path)[:, :, ::-1]
        r = model.detect([np.ascontiguousarray(image)], verbose=0)[0]
        splash = color_splash(image, r["masks"])
        name = "splash_{:%Y%m%dT%H%M%S}.png".format(datetime.datetime.now())
        out = os.path.join(out_dir, name)
        cv2.imwrite(out, splash[:, :, ::-1])
        return out
    vcapture = cv2.VideoCapture(video_path)
    width = int(vcapture.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(vcapture.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = vcapture.get(cv2.CAP_PROP_FPS)
    name = "splash_{:%Y%m%dT%H%M%S}.avi".format(datetime.datetime.now())
    out = os.path.join(out_dir, name)
    vwriter = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"MJPG"),
                              fps, (width, height))
    count = 0
    success = True
    while success:
        success, image = vcapture.read()
        if not success:
            break
        image = image[:, :, ::-1]
        r = model.detect([np.ascontiguousarray(image)], verbose=0)[0]
        splash = color_splash(image, r["masks"])
        vwriter.write(splash[:, :, ::-1])
        count += 1
    vwriter.release()
    return out
