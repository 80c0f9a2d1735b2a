"""Pallas PyramidROIAlign vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from slam_maskrcnn_tpu.ops.roi_align import pyramid_roi_align
from slam_maskrcnn_tpu.ops.pallas.roi_align_kernel import (
    pyramid_roi_align_pallas)

IMAGE_SHAPE = (256, 256)
LEVEL_DIMS = [(64, 64), (32, 32), (16, 16), (8, 8)]
C = 128


def _fixtures(n_boxes, seed=0):
    """Boxes within the kernel's documented aspect<=4 envelope (anchors are
    ratio 0.5/1/2; NMS'd detections rarely exceed 4) + degenerate zero-area
    padded ROIs. Out-of-envelope slivers are covered by the miss test."""
    rng = np.random.RandomState(seed)
    feats = tuple(jnp.asarray(rng.randn(h, w, C).astype(np.float32))
                  for h, w in LEVEL_DIMS)
    y1 = rng.uniform(0, 0.9, n_boxes)
    x1 = rng.uniform(0, 0.9, n_boxes)
    h = rng.uniform(0.01, 0.9, n_boxes) * (1 - y1)
    aspect = rng.uniform(0.25, 4.0, n_boxes)
    w = np.minimum(h * aspect, 0.98 - x1)
    boxes = np.stack([y1, x1, y1 + h, x1 + w], -1).astype(np.float32)
    boxes[-2:] = 0.0
    return feats, jnp.asarray(boxes)


def test_pallas_roi_align_matches_oracle_f32():
    feats, boxes = _fixtures(24)
    ref = pyramid_roi_align(feats, boxes, 7, IMAGE_SHAPE)
    out = pyramid_roi_align_pallas(feats, boxes, 7, IMAGE_SHAPE,
                                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_roi_align_bf16_close():
    feats, boxes = _fixtures(16, seed=1)
    ref = pyramid_roi_align(feats, boxes, 7, IMAGE_SHAPE)
    out = pyramid_roi_align_pallas(feats, boxes, 7, IMAGE_SHAPE)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() <= 0.03 * scale, f"bf16 err {err.max()} vs {scale}"


def test_pallas_roi_align_miss_counter():
    """Boxes within the aspect envelope report zero misses; a pathological
    aspect-50 sliver is clamped and counted (the safety-valve contract)."""
    feats, boxes = _fixtures(8, seed=3)
    _, miss = pyramid_roi_align_pallas(feats, boxes, 7, IMAGE_SHAPE,
                                       compute_dtype=jnp.float32,
                                       return_misses=True)
    assert int(miss) == 0
    sliver = jnp.asarray([[0.1, 0.0, 0.102, 1.0]], jnp.float32)
    _, miss = pyramid_roi_align_pallas(feats, sliver, 7, IMAGE_SHAPE,
                                       compute_dtype=jnp.float32,
                                       return_misses=True)
    assert int(miss) > 0


def test_pallas_roi_align_mask_pool14():
    feats, boxes = _fixtures(8, seed=2)
    ref = pyramid_roi_align(feats, boxes, 14, IMAGE_SHAPE)
    out = pyramid_roi_align_pallas(feats, boxes, 14, IMAGE_SHAPE,
                                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
