"""Box operations (jnp). Convention: (y1, x1, y2, x2), as the reference
(``Mask_RCNN/mrcnn/utils.py:32-230``). All fixed-shape, vmap-friendly —
the reference's per-image ``batch_slice`` shim (``utils.py:808-842``) is
replaced by ``jax.vmap`` end to end (SURVEY §2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_rows(table: jax.Array, ix: jax.Array) -> jax.Array:
    """``table[ix]`` for a [N, D] table with small D, in the fast gather
    form: D separate 1-D gathers from the transposed table (~12-18
    ns/index on TPU) instead of the [ix, 1, D]-slice gather XLA emits for
    row indexing (~2.3 us/slice — measured 12 ms of the detect program
    for the proposal layer's 2x6000 box-row gathers, PERFORMANCE.md)."""
    t = table.T
    return jnp.stack([t[d][ix] for d in range(table.shape[-1])], axis=-1)


def compute_iou_matrix(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise IoU [N, M]. = ``utils.compute_overlaps`` (utils.py:79-95)."""
    y1 = jnp.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    x1 = jnp.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    y2 = jnp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    x2 = jnp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    inter = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)
    a1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    a2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def apply_box_deltas(boxes: jax.Array, deltas: jax.Array) -> jax.Array:
    """Apply (dy, dx, log dh, log dw) refinements.
    = ``utils.apply_box_deltas`` / ``apply_box_deltas_graph``
    (utils.py:153-174, model.py:229-247)."""
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    cy = boxes[..., 0] + 0.5 * h
    cx = boxes[..., 1] + 0.5 * w
    cy = cy + deltas[..., 0] * h
    cx = cx + deltas[..., 1] * w
    h = h * jnp.exp(deltas[..., 2])
    w = w * jnp.exp(deltas[..., 3])
    y1 = cy - 0.5 * h
    x1 = cx - 0.5 * w
    return jnp.stack([y1, x1, y1 + h, x1 + w], axis=-1)


def box_refinement(box: jax.Array, gt_box: jax.Array) -> jax.Array:
    """Inverse of apply_box_deltas: deltas transforming box -> gt_box.
    = ``utils.box_refinement_graph`` (utils.py:177-200)."""
    h = box[..., 2] - box[..., 0]
    w = box[..., 3] - box[..., 1]
    cy = box[..., 0] + 0.5 * h
    cx = box[..., 1] + 0.5 * w
    gh = gt_box[..., 2] - gt_box[..., 0]
    gw = gt_box[..., 3] - gt_box[..., 1]
    gcy = gt_box[..., 0] + 0.5 * gh
    gcx = gt_box[..., 1] + 0.5 * gw
    h = jnp.maximum(h, 1e-8)
    w = jnp.maximum(w, 1e-8)
    return jnp.stack([(gcy - cy) / h, (gcx - cx) / w,
                      jnp.log(jnp.maximum(gh, 1e-8) / h),
                      jnp.log(jnp.maximum(gw, 1e-8) / w)], axis=-1)


def clip_boxes(boxes: jax.Array, window: jax.Array) -> jax.Array:
    """Clip to window (y1, x1, y2, x2). = ``clip_boxes_graph``
    (model.py:250-259)."""
    wy1, wx1, wy2, wx2 = window[0], window[1], window[2], window[3]
    y1 = jnp.clip(boxes[..., 0], wy1, wy2)
    x1 = jnp.clip(boxes[..., 1], wx1, wx2)
    y2 = jnp.clip(boxes[..., 2], wy1, wy2)
    x2 = jnp.clip(boxes[..., 3], wx1, wx2)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def norm_boxes(boxes: jax.Array, shape) -> jax.Array:
    """Pixel -> normalized coords, with the reference's (shape - 1) shift
    (``utils.norm_boxes``, utils.py:858-872)."""
    h, w = shape
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], jnp.float32)
    shift = jnp.array([0, 0, 1, 1], jnp.float32)
    return (boxes.astype(jnp.float32) - shift) / scale


def denorm_boxes(boxes: jax.Array, shape) -> jax.Array:
    """Normalized -> pixel coords (``utils.denorm_boxes``, utils.py:875-889)."""
    h, w = shape
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], jnp.float32)
    shift = jnp.array([0, 0, 1, 1], jnp.float32)
    return jnp.round(boxes * scale + shift).astype(jnp.int32)
