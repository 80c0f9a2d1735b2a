"""Training target builders.

* ``build_rpn_targets`` — host-side numpy, per image, in the data pipeline
  (= ``Mask_RCNN/mrcnn/model.py:1450-1558``). Emits per-anchor-aligned
  deltas (zeros at non-positives) instead of the reference's front-packed
  [256, 4] buffer — same information, static-shape-friendly; the loss
  selects positives by ``rpn_match == 1``.
* ``detection_targets`` — on-device (jnp), static shapes
  (= ``DetectionTargetLayer`` / ``detection_targets_graph``,
  ``model.py:491-682``): IoU matching, 33%-positive subsampling, per-roi
  class/delta/mask targets. The reference's dynamic boolean gathers become
  fixed-size top-k selections with validity masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from slam_maskrcnn_tpu.ops.boxes import box_refinement, compute_iou_matrix
from slam_maskrcnn_tpu.ops.roi_align import crop_and_resize


def build_rpn_targets(anchors: np.ndarray, gt_class_ids: np.ndarray,
                      gt_boxes: np.ndarray, config) -> tuple[np.ndarray, np.ndarray]:
    """Returns (rpn_match [A] in {-1, 0, 1}, rpn_bbox [A, 4] aligned)."""
    rpn_match = np.zeros(anchors.shape[0], np.int32)
    rpn_bbox = np.zeros((anchors.shape[0], 4), np.float32)
    if gt_boxes.shape[0] == 0:
        return rpn_match, rpn_bbox

    # crowds (negative ids) don't count as gt; anchors overlapping a crowd
    # box are neutral (model.py:1472-1487)
    crowd_ix = np.where(gt_class_ids < 0)[0]
    if crowd_ix.shape[0] > 0:
        non_crowd_ix = np.where(gt_class_ids > 0)[0]
        crowd_boxes = gt_boxes[crowd_ix]
        gt_boxes = gt_boxes[non_crowd_ix]
        crowd_overlaps = _overlaps_np(anchors, crowd_boxes)
        no_crowd = crowd_overlaps.max(axis=1) < 0.001
    else:
        no_crowd = np.ones(anchors.shape[0], bool)
    if gt_boxes.shape[0] == 0:
        return rpn_match, rpn_bbox

    overlaps = _overlaps_np(anchors, gt_boxes)
    anchor_iou_argmax = overlaps.argmax(axis=1)
    anchor_iou_max = overlaps[np.arange(len(anchors)), anchor_iou_argmax]
    rpn_match[(anchor_iou_max < 0.3) & no_crowd] = -1
    # best anchor per gt is positive regardless of IoU (incl. ties,
    # model.py:1499-1502)
    gt_iou_argmax = np.argwhere(overlaps == overlaps.max(axis=0))[:, 0]
    rpn_match[gt_iou_argmax] = 1
    rpn_match[anchor_iou_max >= 0.7] = 1

    # subsample (model.py:1507-1519)
    ids = np.where(rpn_match == 1)[0]
    extra = len(ids) - config.RPN_TRAIN_ANCHORS_PER_IMAGE // 2
    if extra > 0:
        rpn_match[np.random.choice(ids, extra, replace=False)] = 0
    ids = np.where(rpn_match == -1)[0]
    extra = len(ids) - (config.RPN_TRAIN_ANCHORS_PER_IMAGE
                        - np.sum(rpn_match == 1))
    if extra > 0:
        rpn_match[np.random.choice(ids, extra, replace=False)] = 0

    # deltas for positives, normalized by std (model.py:1522-1556)
    ids = np.where(rpn_match == 1)[0]
    for i in ids:
        gt = gt_boxes[anchor_iou_argmax[i]]
        a = anchors[i]
        ah, aw = a[2] - a[0], a[3] - a[1]
        acy, acx = a[0] + 0.5 * ah, a[1] + 0.5 * aw
        gh, gw = gt[2] - gt[0], gt[3] - gt[1]
        gcy, gcx = gt[0] + 0.5 * gh, gt[1] + 0.5 * gw
        rpn_bbox[i] = [(gcy - acy) / ah, (gcx - acx) / aw,
                       np.log(gh / ah), np.log(gw / aw)]
        rpn_bbox[i] /= config.RPN_BBOX_STD_DEV
    return rpn_match, rpn_bbox


def _overlaps_np(boxes1, boxes2):
    y1 = np.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    x1 = np.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    y2 = np.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    x2 = np.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
    a1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    a2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-10)


@partial(jax.jit, static_argnames=("train_rois", "mask_size", "positive_ratio"))
def detection_targets(rng: jax.Array, proposals: jax.Array,
                      gt_class_ids: jax.Array, gt_boxes: jax.Array,
                      gt_masks: jax.Array, *, train_rois: int = 200,
                      positive_ratio: float = 0.33, mask_size: int = 28,
                      bbox_std=(0.1, 0.1, 0.2, 0.2)):
    """Single image. proposals [P, 4] zero-padded; gt_class_ids [G] (0 pad,
    <0 crowd); gt_boxes [G, 4] normalized; gt_masks [G, h, w] (mini-masks,
    box-relative). Returns (rois [T,4], class_ids [T], deltas [T,4],
    masks [T, m, m], valid [T])."""
    P = proposals.shape[0]
    G = gt_boxes.shape[0]
    prop_valid = ((proposals[:, 2] - proposals[:, 0])
                  * (proposals[:, 3] - proposals[:, 1])) > 0
    gt_valid = gt_class_ids > 0
    crowd = gt_class_ids < 0

    iou = compute_iou_matrix(proposals, gt_boxes)  # [P, G]
    iou_gt = jnp.where(gt_valid[None, :], iou, -1.0)
    iou_crowd = jnp.where(crowd[None, :], iou, -1.0)
    roi_iou_max = iou_gt.max(axis=1)
    crowd_iou_max = iou_crowd.max(axis=1)

    positive = prop_valid & (roi_iou_max >= 0.5)
    negative = prop_valid & (roi_iou_max < 0.5) & (crowd_iou_max < 0.001)

    pos_count = int(round(train_rois * positive_ratio))
    neg_count = train_rois - pos_count

    # random subsample via noisy scores + top_k (static-size choice)
    k1, k2 = jax.random.split(rng)
    pos_score = jnp.where(positive, jax.random.uniform(k1, (P,)), -1.0)
    neg_score = jnp.where(negative, jax.random.uniform(k2, (P,)), -1.0)
    _, pos_ix = jax.lax.top_k(pos_score, pos_count)
    _, neg_ix = jax.lax.top_k(neg_score, neg_count)
    pos_ok = pos_score[pos_ix] > 0
    neg_ok = neg_score[neg_ix] > 0
    # the reference keeps the 1:0.33 ratio by trimming negatives to
    # pos/ratio - pos (model.py:553-559); with fixed T we keep neg_count
    # slots and mask invalid ones.

    rois = jnp.concatenate([proposals[pos_ix], proposals[neg_ix]], axis=0)
    valid = jnp.concatenate([pos_ok, neg_ok], axis=0)
    is_pos = jnp.concatenate(
        [pos_ok, jnp.zeros((neg_count,), bool)], axis=0)

    # per-positive best gt
    best_gt = jnp.argmax(iou_gt[pos_ix], axis=1)
    pos_class = jnp.where(pos_ok, gt_class_ids[best_gt], 0)
    class_ids = jnp.concatenate(
        [pos_class, jnp.zeros((neg_count,), pos_class.dtype)], axis=0)

    deltas_pos = box_refinement(proposals[pos_ix], gt_boxes[best_gt])
    deltas_pos = deltas_pos / jnp.asarray(bbox_std, jnp.float32)
    deltas = jnp.concatenate(
        [deltas_pos, jnp.zeros((neg_count, 4), jnp.float32)], axis=0)
    deltas = deltas * is_pos[:, None]

    # mask targets: crop gt (mini) mask with the roi box expressed in
    # gt-box-relative coordinates (model.py:620-655, USE_MINI_MASK branch)
    gt_box_pos = gt_boxes[best_gt]
    roi_pos = proposals[pos_ix]
    gh = jnp.maximum(gt_box_pos[:, 2] - gt_box_pos[:, 0], 1e-8)
    gw = jnp.maximum(gt_box_pos[:, 3] - gt_box_pos[:, 1], 1e-8)
    rel = jnp.stack([(roi_pos[:, 0] - gt_box_pos[:, 0]) / gh,
                     (roi_pos[:, 1] - gt_box_pos[:, 1]) / gw,
                     (roi_pos[:, 2] - gt_box_pos[:, 0]) / gh,
                     (roi_pos[:, 3] - gt_box_pos[:, 1]) / gw], axis=1)

    def crop_one(mask2d, box):
        return crop_and_resize(mask2d[:, :, None].astype(jnp.float32),
                               box[None], (mask_size, mask_size))[0, :, :, 0]

    masks_pos = jax.vmap(crop_one)(gt_masks[best_gt], rel)
    masks_pos = jnp.round(masks_pos)  # threshold 0.5 (model.py:654)
    masks = jnp.concatenate(
        [masks_pos, jnp.zeros((neg_count, mask_size, mask_size),
                              jnp.float32)], axis=0)
    masks = masks * is_pos[:, None, None]

    rois = rois * valid[:, None]
    return rois, class_ids, deltas, masks, valid
