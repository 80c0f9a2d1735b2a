"""Non-maximum suppression with static shapes.

The reference leans on ``tf.image.non_max_suppression`` inside
``ProposalLayer`` and ``refine_detections_graph`` (``model.py:325,741``) —
one of the two TF-native ops SURVEY §2.4(8) flags for TPU-custom
implementation. TPU needs fixed output sizes, so this NMS returns exactly
``max_output`` indices plus a validity mask (padded with the reference's
same pad-to-count contract, model.py:328-333).

The jnp path below is the reference implementation + oracle; a Pallas
variant lives in ops/pallas/. Algorithm: standard greedy NMS expressed as a
fixed-trip loop over selection slots — O(max_output * N) IoU work, fully
vectorized over N.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slam_maskrcnn_tpu.ops.boxes import compute_iou_matrix

NEG_INF = -1e9


@partial(jax.jit, static_argnames=("max_output",))
def non_max_suppression(boxes: jax.Array, scores: jax.Array,
                        max_output: int, iou_threshold: float = 0.5,
                        score_threshold: float = float("-inf")):
    """Greedy NMS. Returns (indices i32 [max_output], valid bool [max_output]).

    Matches tf.image.non_max_suppression semantics: scan candidates in
    descending score order; keep a box iff its IoU with every already-kept
    box is <= iou_threshold; stop at max_output. Padded with index 0 where
    invalid.
    """
    n = boxes.shape[0]
    scores = jnp.where(scores > score_threshold, scores, NEG_INF)

    def body(carry, _):
        live_scores, suppressed = carry
        idx = jnp.argmax(live_scores)
        ok = live_scores[idx] > NEG_INF / 2
        iou = compute_iou_matrix(boxes[idx][None], boxes)[0]
        kill = (iou > iou_threshold) | (jnp.arange(n) == idx)
        live_scores = jnp.where(kill, NEG_INF, live_scores)
        return (live_scores, suppressed), (idx.astype(jnp.int32), ok)

    (_, _), (idxs, valid) = jax.lax.scan(body, (scores, None), None,
                                         length=max_output)
    idxs = jnp.where(valid, idxs, 0)
    return idxs, valid


@partial(jax.jit, static_argnames=("max_output",))
def nms_padded(boxes: jax.Array, scores: jax.Array, valid_in: jax.Array,
               max_output: int, iou_threshold: float = 0.5):
    """NMS over a padded candidate set (invalid rows ignored)."""
    scores = jnp.where(valid_in, scores, NEG_INF)
    return non_max_suppression(boxes, scores, max_output, iou_threshold,
                               score_threshold=NEG_INF / 2)


def nms_auto(boxes: jax.Array, scores: jax.Array, max_output: int,
             iou_threshold: float = 0.5,
             score_threshold: float = float("-inf")):
    """Backend-dispatched NMS: the Pallas kernel on TPU (the lax.scan
    greedy loop costs ~20 us/iteration of dispatch — ~20 ms of the 30.8 ms
    detect device program at 1000 proposals, PERFORMANCE.md), the scan
    oracle elsewhere. Same contract as non_max_suppression; the two are
    parity-tested in tests/test_ops.py."""
    if jax.default_backend() == "tpu":
        from slam_maskrcnn_tpu.ops.pallas.nms_kernel import (
            non_max_suppression_pallas)
        # NMS selection is non-differentiable (integer indices + validity);
        # cut tangents so grad tracing in the training graph never invokes
        # the pallas JVP rule (reference: tf NMS is likewise a gradient
        # boundary)
        boxes = jax.lax.stop_gradient(boxes)
        scores = jax.lax.stop_gradient(scores)
        return non_max_suppression_pallas(boxes, scores, max_output,
                                          iou_threshold, score_threshold)
    return non_max_suppression(boxes, scores, max_output, iou_threshold,
                               score_threshold)
