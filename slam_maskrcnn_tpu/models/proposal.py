"""Proposal generation: top-k anchors -> deltas -> clip -> NMS -> pad.

= ``ProposalLayer`` (``Mask_RCNN/mrcnn/model.py:261-338``) with TPU-static
shapes: the reference's per-image ``batch_slice`` becomes ``jax.vmap``, and
``tf.image.non_max_suppression``'s dynamic output becomes our fixed-size
padded NMS (ops/nms.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slam_maskrcnn_tpu.ops.boxes import (apply_box_deltas, clip_boxes,
                                         take_rows)
from slam_maskrcnn_tpu.ops.nms import nms_auto


@partial(jax.jit, static_argnames=("proposal_count", "pre_nms_limit"))
def generate_proposals(rpn_probs: jax.Array, rpn_bbox: jax.Array,
                       anchors: jax.Array, proposal_count: int,
                       nms_threshold: float = 0.7,
                       pre_nms_limit: int = 6000,
                       bbox_std: tuple = (0.1, 0.1, 0.2, 0.2)):
    """Batched proposal generation.

    rpn_probs [B, A, 2], rpn_bbox [B, A, 4], anchors [A, 4] normalized.
    Returns (proposals [B, proposal_count, 4] zero-padded, valid [B, count]).
    """
    std = jnp.asarray(bbox_std, jnp.float32)

    def per_image(probs, deltas):
        scores = probs[:, 1]
        k = min(pre_nms_limit, anchors.shape[0])
        if jax.default_backend() == "tpu" and k < anchors.shape[0]:
            # exact lax.top_k lowers to a full sort (~9 ms over 262k
            # anchors, the single largest piece of the detect program);
            # the TPU-native partial reduce finds the pre-NMS pool in
            # <1 ms at recall 0.95 — the ~5% it can miss are the
            # lowest-scoring tail of a 6000-deep pool that per-image NMS
            # then cuts to 1000, so detections are unaffected in
            # practice. CPU (the parity-test platform) keeps exact top-k,
            # like the reference's tf.nn.top_k (model.py:282).
            top_scores, ix = jax.lax.approx_max_k(scores, k,
                                                  recall_target=0.95)
        else:
            top_scores, ix = jax.lax.top_k(scores, k)
        # take_rows, not table[ix]: [N, 4] row indexing lowers to
        # ~2.3 us/slice gathers — these three were ~12 ms of the detect
        # device program (PERFORMANCE.md)
        top_deltas = take_rows(deltas, ix) * std
        top_anchors = take_rows(anchors, ix)
        boxes = apply_box_deltas(top_anchors, top_deltas)
        boxes = clip_boxes(boxes, jnp.array([0.0, 0.0, 1.0, 1.0]))
        idx, valid = nms_auto(boxes, top_scores, proposal_count,
                              nms_threshold)
        props = jnp.where(valid[:, None], take_rows(boxes, idx), 0.0)
        return props, valid

    return jax.vmap(per_image)(rpn_probs, rpn_bbox)
