"""Rect resize mode (TPU-first extension of utils.resize_image's modes,
see models/config.py IMAGE_RESIZE_MODE): host molding, device molding
geometry and the inference graph must agree and run end to end."""

import numpy as np

from slam_maskrcnn_tpu.models import Config, MaskRCNN
from slam_maskrcnn_tpu.models.mask_rcnn import resize_image
from slam_maskrcnn_tpu.samples.north_star import device_mold_geometry


class RectTiny(Config):
    NAME = "recttiny"
    BACKBONE = "resnet50"
    NUM_CLASSES = 4
    IMAGES_PER_GPU = 1
    GPU_COUNT = 1
    IMAGE_RESIZE_MODE = "rect"
    IMAGE_RECT_SHAPE = (192, 256)
    RPN_ANCHOR_SCALES = (16, 32, 64, 128, 256)
    POST_NMS_ROIS_INFERENCE = 50
    PRE_NMS_LIMIT = 100
    DETECTION_MAX_INSTANCES = 10


def test_rect_geometry_host_device_agree():
    cfg = RectTiny()
    assert tuple(cfg.IMAGE_SHAPE[:2]) == (192, 256)
    H, W = 120, 160
    img = (np.random.RandomState(0).rand(H, W, 3) * 255).astype(np.uint8)
    m, window, scale, padding = resize_image(
        img, cfg.IMAGE_MIN_DIM, cfg.IMAGE_MAX_DIM, cfg.IMAGE_MIN_SCALE,
        "rect", rect_shape=cfg.IMAGE_RECT_SHAPE)
    rh, rw, top, left, mh, mw, nwin = device_mold_geometry(cfg, H, W)
    assert m.shape == (192, 256, 3)
    assert scale == 1.6  # 120x160 fits 192x256 exactly: zero padding
    assert (rh, rw) == (window[2] - window[0], window[3] - window[1])
    assert (top, left) == (window[0], window[1])
    assert (mh, mw) == (192, 256)


def test_rect_geometry_with_padding():
    """A source whose aspect differs from the rect pads the short side,
    centered (like square mode pads both)."""
    cfg = RectTiny()
    H, W = 100, 160  # wider than 3:4 -> vertical padding
    img = np.zeros((H, W, 3), np.uint8)
    m, window, scale, _ = resize_image(img, None, None, 0, "rect",
                                       rect_shape=(192, 256))
    assert m.shape == (192, 256, 3)
    rh, rw, top, left, mh, mw, _ = device_mold_geometry(cfg, H, W)
    assert (window[0], window[1]) == (top, left)
    assert rw == 256 and rh == round(100 * 256 / 160)
    assert top == (192 - rh) // 2 and top > 0


def test_rect_model_detects_end_to_end():
    cfg = RectTiny()
    model = MaskRCNN("inference", cfg)
    model.init_params(0)
    H, W = 120, 160
    img = (np.random.RandomState(1).rand(H, W, 3) * 255).astype(np.uint8)
    out = model.detect([img])[0]
    assert out["masks"].shape[:2] == (H, W)
    rois = out["rois"]
    assert (rois[:, 0] >= 0).all() and (rois[:, 2] <= H).all()
    assert (rois[:, 1] >= 0).all() and (rois[:, 3] <= W).all()
