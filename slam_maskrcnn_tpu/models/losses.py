"""Mask R-CNN losses (5 heads).

= the loss graphs in ``Mask_RCNN/mrcnn/model.py:1015-1183``, rephrased with
masks instead of boolean gathers (static shapes):

* rpn_class_loss  — binary crossentropy on fg/bg anchors; neutral (=0)
  anchors excluded (model.py:1015-1042).
* rpn_bbox_loss   — smooth-L1 on positive anchors only; the reference packs
  target deltas to the front (batch_pack_graph); here the targets are
  delivered aligned per-anchor with a mask (model.py:1045-1082).
* mrcnn_class_loss — sparse softmax CE over sampled rois; inactive dataset
  classes zeroed (model.py:1085-1119).
* mrcnn_bbox_loss — smooth-L1 on the target class's deltas, positive rois
  only (model.py:1122-1146).
* mrcnn_mask_loss — binary CE on the 28x28 (pool*2) mask of the target
  class, positive rois only (model.py:1149-1183).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(diff: jax.Array) -> jax.Array:
    """smooth-L1 (model.py:1048-1054)."""
    a = jnp.abs(diff)
    return jnp.where(a < 1.0, 0.5 * a * a, a - 0.5)


def _safe_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over masked elements; 0 when the mask is empty (the reference's
    K.switch on size, e.g. model.py:1080)."""
    denom = jnp.maximum(mask.sum(), 1.0)
    return jnp.where(mask.sum() > 0, (x * mask).sum() / denom, 0.0)


def rpn_class_loss(rpn_match: jax.Array, rpn_class_logits: jax.Array):
    """rpn_match [B, A]: 1 = positive, -1 = negative, 0 = neutral.
    logits [B, A, 2]."""
    anchor_class = (rpn_match == 1).astype(jnp.int32)
    use = (rpn_match != 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(rpn_class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, anchor_class[..., None], axis=-1)[..., 0]
    return _safe_mean(ce, use)


def rpn_bbox_loss(target_bbox: jax.Array, rpn_match: jax.Array,
                  rpn_bbox: jax.Array):
    """target_bbox [B, A, 4] aligned per anchor (zeros where not positive);
    positive anchors selected by rpn_match == 1."""
    pos = (rpn_match == 1).astype(jnp.float32)
    l1 = smooth_l1(target_bbox - rpn_bbox).sum(-1)
    # the reference averages over (positive anchors * 4 coords); summing the
    # 4 coords then dividing by count*... it uses K.mean over gathered
    # elements — mean over coords and anchors. Match: mean of per-coord.
    l1c = smooth_l1(target_bbox - rpn_bbox)
    denom = jnp.maximum(pos.sum() * 4.0, 1.0)
    return jnp.where(pos.sum() > 0, (l1c * pos[..., None]).sum() / denom, 0.0)


def mrcnn_class_loss(target_class_ids: jax.Array, logits: jax.Array,
                     active_class_ids: jax.Array, roi_valid: jax.Array):
    """target_class_ids [B, T] i32; logits [B, T, C];
    active_class_ids [B, C]; roi_valid [B, T] (padding mask — the reference
    relies on zero-padded rois producing bg targets; we mask explicitly)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target_class_ids[..., None],
                              axis=-1)[..., 0]
    # zero loss for predictions of classes not in the image's dataset
    pred_active = jnp.take_along_axis(
        active_class_ids, jnp.argmax(logits, axis=-1), axis=-1)
    w = pred_active.astype(jnp.float32) * roi_valid.astype(jnp.float32)
    return _safe_mean(ce, w)


def mrcnn_bbox_loss(target_bbox: jax.Array, target_class_ids: jax.Array,
                    pred_bbox: jax.Array):
    """target_bbox [B, T, 4]; pred_bbox [B, T, C, 4]; positives = class>0."""
    pos = (target_class_ids > 0).astype(jnp.float32)
    pred = jnp.take_along_axis(
        pred_bbox, target_class_ids[..., None, None].repeat(4, -1),
        axis=2)[:, :, 0]
    l1 = smooth_l1(target_bbox - pred)
    denom = jnp.maximum(pos.sum() * 4.0, 1.0)
    return jnp.where(pos.sum() > 0, (l1 * pos[..., None]).sum() / denom, 0.0)


def mrcnn_mask_loss(target_masks: jax.Array, target_class_ids: jax.Array,
                    pred_masks: jax.Array):
    """target_masks [B, T, h, w] {0,1}; pred_masks [B, T, h, w, C] sigmoid."""
    pos = (target_class_ids > 0).astype(jnp.float32)
    C = pred_masks.shape[-1]
    cls = jnp.clip(target_class_ids, 0, C - 1)
    pred = jnp.take_along_axis(
        pred_masks, cls[..., None, None, None], axis=-1)[..., 0]
    pred = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    bce = -(target_masks * jnp.log(pred)
            + (1.0 - target_masks) * jnp.log(1.0 - pred))
    bce = bce.mean(axis=(-1, -2))
    return _safe_mean(bce, pos)


def total_loss(outputs: dict, targets: dict, loss_weights: dict | None = None):
    """Weighted sum of the 5 losses (+ per-loss dict for logging)."""
    lw = loss_weights or {}
    losses = {
        "rpn_class_loss": rpn_class_loss(
            targets["rpn_match"], outputs["rpn_class_logits"]),
        "rpn_bbox_loss": rpn_bbox_loss(
            targets["rpn_bbox"], targets["rpn_match"], outputs["rpn_bbox"]),
        "mrcnn_class_loss": mrcnn_class_loss(
            targets["target_class_ids"], outputs["mrcnn_class_logits"],
            targets["active_class_ids"], targets["roi_valid"]),
        "mrcnn_bbox_loss": mrcnn_bbox_loss(
            targets["target_bbox"], targets["target_class_ids"],
            outputs["mrcnn_bbox"]),
        "mrcnn_mask_loss": mrcnn_mask_loss(
            targets["target_mask"], targets["target_class_ids"],
            outputs["mrcnn_masks"]),
    }
    total = sum(lw.get(k, 1.0) * v for k, v in losses.items())
    return total, losses
