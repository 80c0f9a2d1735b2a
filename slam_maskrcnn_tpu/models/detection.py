"""Detection refinement: class-specific deltas + per-class NMS + top-k.

= ``refine_detections_graph`` / ``DetectionLayer``
(``Mask_RCNN/mrcnn/model.py:689-828``), reformulated static-shape:

The reference gathers variable-length keeps with tf.where/tf.unique/map_fn.
Here per-class NMS uses the *class-offset trick*: shift every box by
``class_id * 2`` (boxes are normalized to [0,1], so different classes can
never overlap), then one global fixed-size NMS. Greedy NMS visits boxes in
global score order but suppression only acts within a class, so the result
equals the reference's per-class NMS + merge + top-k-by-score.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slam_maskrcnn_tpu.ops.boxes import apply_box_deltas, clip_boxes
from slam_maskrcnn_tpu.ops.nms import nms_auto
from slam_maskrcnn_tpu.ops.boxes import take_rows

NEG_INF = -1e9


def refine_detections(rois: jax.Array, probs: jax.Array, deltas: jax.Array,
                      window: jax.Array, *, max_instances: int,
                      min_confidence: float, nms_threshold: float,
                      bbox_std=(0.1, 0.1, 0.2, 0.2)):
    """Single image. rois [N,4] normalized; probs [N,C]; deltas [N,C,4];
    window [4] normalized. Returns detections [max_instances, 6]
    (y1, x1, y2, x2, class_id, score), zero-padded, plus valid mask."""
    N = rois.shape[0]
    class_ids = jnp.argmax(probs, axis=1)
    # per-row class selects as dense one-hot contractions: take_along_axis
    # over the C-wide axis lowers to scalar/slice gathers (~130 ns/row for
    # scores, ~2.3 us/row for the [1, 1, 4] delta slices)
    # elementwise one-hot select (NOT einsum: dot_general at default
    # precision truncates f32 to bf16 on TPU — ~0.2% rounding that can flip
    # borderline DETECTION_MIN_CONFIDENCE comparisons and NMS order)
    oh = (class_ids[:, None]
          == jnp.arange(probs.shape[1])[None, :]).astype(probs.dtype)
    class_scores = jnp.sum(probs * oh, axis=1)
    deltas_specific = jnp.sum(deltas * oh[:, :, None], axis=1)
    refined = apply_box_deltas(rois, deltas_specific * jnp.asarray(bbox_std))
    refined = clip_boxes(refined, window)

    keep = class_ids > 0
    if min_confidence:
        keep &= class_scores >= min_confidence
    # padded rois (all-zero) produce bg argmax or low scores; also drop rois
    # with zero area (zero-padding from the proposal stage)
    area = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    keep &= area > 0

    # class-offset trick: boxes are in [0,1]; offsetting by 2*class keeps
    # same-class geometry intact and separates classes by >1 box size
    offset = class_ids.astype(jnp.float32)[:, None] * 2.0
    nms_boxes = refined + offset
    nms_scores = jnp.where(keep, class_scores, NEG_INF)
    idx, valid = nms_auto(nms_boxes, nms_scores, max_instances,
                          nms_threshold, score_threshold=NEG_INF / 2)

    det_boxes = take_rows(refined, idx)
    det_ids = class_ids[idx].astype(jnp.float32)
    det_scores = class_scores[idx]
    detections = jnp.concatenate(
        [det_boxes, det_ids[:, None], det_scores[:, None]], axis=1)
    detections = jnp.where(valid[:, None], detections, 0.0)
    return detections, valid


@partial(jax.jit, static_argnames=("max_instances", "min_confidence",
                                   "nms_threshold", "bbox_std"))
def detection_layer(rois, probs, deltas, windows, *, max_instances: int,
                    min_confidence: float, nms_threshold: float,
                    bbox_std=(0.1, 0.1, 0.2, 0.2)):
    """Batched over images: rois [B,N,4], probs [B,N,C], deltas [B,N,C,4],
    windows [B,4] normalized."""
    fn = lambda r, p, d, w: refine_detections(
        r, p, d, w, max_instances=max_instances,
        min_confidence=min_confidence, nms_threshold=nms_threshold,
        bbox_std=bbox_std)
    return jax.vmap(fn)(rois, probs, deltas, windows)
