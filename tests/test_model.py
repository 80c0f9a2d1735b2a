"""Mask R-CNN model tests: shape contracts on a small config, proposal /
detection layer semantics, target builders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_maskrcnn_tpu.models import Config, MaskRCNN, get_anchors
from slam_maskrcnn_tpu.models.detection import refine_detections
from slam_maskrcnn_tpu.models.proposal import generate_proposals
from slam_maskrcnn_tpu.models.targets import build_rpn_targets, detection_targets


class TinyConfig(Config):
    NAME = "tiny"
    BACKBONE = "resnet50"
    IMAGE_MIN_DIM = 128
    IMAGE_MAX_DIM = 128
    NUM_CLASSES = 4
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    POST_NMS_ROIS_INFERENCE = 50
    PRE_NMS_LIMIT = 200
    DETECTION_MAX_INSTANCES = 10
    IMAGES_PER_GPU = 1
    GPU_COUNT = 1
    DETECTION_MIN_CONFIDENCE = 0.0
    COMPUTE_DTYPE = "float32"


@pytest.fixture(scope="module")
def tiny_model():
    cfg = TinyConfig()
    model = MaskRCNN("inference", cfg)
    model.init_params(0)
    return model


def test_detect_shapes_and_types(tiny_model):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(100, 120, 3), dtype=np.uint8)
    results = tiny_model.detect([img])
    assert len(results) == 1
    r = results[0]
    n = r["rois"].shape[0]
    assert r["rois"].shape == (n, 4)
    assert r["class_ids"].shape == (n,)
    assert r["scores"].shape == (n,)
    assert r["masks"].shape == (100, 120, n)
    assert r["masks"].dtype == bool
    # rois within image bounds
    if n:
        assert r["rois"].min() >= 0
        assert r["rois"][:, 0].max() <= 100 and r["rois"][:, 1].max() <= 120


def test_anchors_normalized(tiny_model):
    a = get_anchors(tiny_model.config, tiny_model.config.IMAGE_SHAPE)
    assert a.ndim == 2 and a.shape[1] == 4
    # anchors roughly within [-0.5, 1.5] normalized
    assert a.min() > -1.0 and a.max() < 2.0


def test_generate_proposals_orders_and_pads():
    A = 100
    rng = np.random.default_rng(1)
    anchors = np.stack([
        rng.uniform(0, 0.7, A), rng.uniform(0, 0.7, A),
        rng.uniform(0.75, 1.0, A), rng.uniform(0.75, 1.0, A)], -1)
    probs = rng.uniform(size=(1, A, 2)).astype(np.float32)
    deltas = np.zeros((1, A, 4), np.float32)
    props, valid = generate_proposals(jnp.asarray(probs), jnp.asarray(deltas),
                                      jnp.asarray(anchors, jnp.float32),
                                      proposal_count=20, pre_nms_limit=50)
    props, valid = np.asarray(props), np.asarray(valid)
    assert props.shape == (1, 20, 4)
    assert (props[0][~valid[0]] == 0).all()  # zero padded
    assert (props[0, valid[0], 2:] >= props[0, valid[0], :2]).all()
    assert props.min() >= 0 and props.max() <= 1


def test_refine_detections_class_offset_nms():
    # two overlapping boxes of the same class -> one survives;
    # same geometry different class -> both survive
    rois = jnp.asarray([[0.1, 0.1, 0.5, 0.5],
                        [0.12, 0.12, 0.5, 0.5],
                        [0.1, 0.1, 0.5, 0.5]], jnp.float32)
    C = 3
    probs = np.zeros((3, C), np.float32)
    probs[0] = [0.05, 0.9, 0.05]   # class 1, high
    probs[1] = [0.1, 0.8, 0.1]     # class 1, lower, overlaps 0 -> suppressed
    probs[2] = [0.05, 0.05, 0.9]   # class 2, overlaps geometrically only
    deltas = jnp.zeros((3, C, 4), jnp.float32)
    window = jnp.asarray([0, 0, 1, 1], jnp.float32)
    det, valid = refine_detections(rois, jnp.asarray(probs), deltas, window,
                                   max_instances=5, min_confidence=0.5,
                                   nms_threshold=0.3)
    det, valid = np.asarray(det), np.asarray(valid)
    kept = det[valid]
    assert len(kept) == 2
    assert set(kept[:, 4].astype(int)) == {1, 2}
    # ordered by score
    assert kept[0, 5] >= kept[1, 5]


def test_build_rpn_targets_basics():
    cfg = TinyConfig()
    anchors = np.array([[0, 0, 10, 10], [0, 0, 12, 12], [50, 50, 60, 60],
                        [100, 100, 120, 120]], np.float32)
    gt_boxes = np.array([[0, 0, 11, 11]], np.float32)
    gt_ids = np.array([1])
    match, bbox = build_rpn_targets(anchors, gt_ids, gt_boxes, cfg)
    assert match[0] == 1 or match[1] == 1  # best anchor positive
    assert (match == 1).sum() >= 1
    assert (match == -1).sum() >= 1
    # positive anchors have nonzero deltas rows
    assert np.abs(bbox[match == 1]).sum() > 0
    assert np.abs(bbox[match != 1]).sum() == 0


def test_detection_targets_static_shapes():
    rng = jax.random.PRNGKey(0)
    P, G, T = 30, 5, 12
    props = np.zeros((P, 4), np.float32)
    props[:10] = np.array([0.1, 0.1, 0.3, 0.3]) + \
        np.random.default_rng(0).uniform(-0.05, 0.05, (10, 4))
    props = np.clip(props, 0, 1)
    props[:, 2:] = np.maximum(props[:, 2:], props[:, :2] + 0.01)
    props[10:] = 0  # padding
    gt_boxes = np.zeros((G, 4), np.float32)
    gt_boxes[0] = [0.1, 0.1, 0.3, 0.3]
    gt_ids = np.zeros((G,), np.int32)
    gt_ids[0] = 2
    gt_masks = np.ones((G, 28, 28), np.float32)
    rois, cls, deltas, masks, valid = detection_targets(
        rng, jnp.asarray(props), jnp.asarray(gt_ids), jnp.asarray(gt_boxes),
        jnp.asarray(gt_masks), train_rois=T, mask_size=14)
    assert rois.shape == (T, 4)
    assert cls.shape == (T,)
    assert deltas.shape == (T, 4)
    assert masks.shape == (T, 14, 14)
    cls, valid = np.asarray(cls), np.asarray(valid)
    assert (cls[np.asarray(valid)] >= 0).all()
    # the seeded positives matched gt class 2
    assert (cls == 2).sum() > 0
