"""Pallas greedy NMS kernel.

The XLA reference implementation (ops/nms.py) is a lax.scan whose
per-iteration cost is dominated by loop overhead (~20 us/iter measured,
PERFORMANCE.md) — 1000 selections cost ~20 ms. This kernel runs the whole
greedy loop inside one Pallas program with all state in VMEM: per
iteration one argmax + one IoU row, pure VPU work.

Mosaic layout notes: boxes are stored transposed [4, N] (lane dim = N,
128-multiple); single-element reads/writes at unaligned lane positions are
done with one-hot selects instead of dynamic slices (lane-dim dynamic
slices must be 128-aligned).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e9  # python float: jnp constants would be captured tracers in the kernel


def _nms_kernel(boxes_ref, scores_ref, thr_ref, idx_ref, valid_ref, sc,
                *, max_output: int, n: int):
    # iou_threshold arrives as an SMEM scalar input: call sites pass it as
    # a traced value (generate_proposals jits it non-static), and a pallas
    # kernel may not capture traced constants from the enclosing trace
    iou_threshold = thr_ref[0]
    sc[:] = scores_ref[:]
    y1 = boxes_ref[0:1, :]
    x1 = boxes_ref[1:2, :]
    y2 = boxes_ref[2:3, :]
    x2 = boxes_ref[3:4, :]
    areas = (y2 - y1) * (x2 - x1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, max_output), 1)

    idx_ref[:] = jnp.zeros((1, max_output), jnp.int32)
    valid_ref[:] = jnp.zeros((1, max_output), jnp.int32)

    def body(k, _):
        s = sc[:]
        best = jnp.max(s)
        ok = best > NEG / 2
        sel = jnp.argmax(s[0, :]).astype(jnp.int32)
        oh = (lanes == sel).astype(jnp.float32)
        # the selected box via one-hot reduction (lane-unaligned read)
        by1 = jnp.sum(y1 * oh)
        bx1 = jnp.sum(x1 * oh)
        by2 = jnp.sum(y2 * oh)
        bx2 = jnp.sum(x2 * oh)
        barea = (by2 - by1) * (bx2 - bx1)
        iy1 = jnp.maximum(y1, by1)
        ix1 = jnp.maximum(x1, bx1)
        iy2 = jnp.minimum(y2, by2)
        ix2 = jnp.minimum(x2, bx2)
        inter = jnp.maximum(iy2 - iy1, 0.0) * jnp.maximum(ix2 - ix1, 0.0)
        iou = inter / jnp.maximum(areas + barea - inter, 1e-10)
        kill = (iou > iou_threshold) | (lanes == sel)
        sc[:] = jnp.where(kill & ok, NEG, s)
        # lane-unaligned writes via one-hot merge
        at_k = out_lanes == k
        idx_ref[:] = jnp.where(at_k & ok, sel, idx_ref[:])
        valid_ref[:] = jnp.where(at_k & ok, 1, valid_ref[:])
        return 0

    jax.lax.fori_loop(0, max_output, body, 0)


@partial(jax.jit, static_argnames=("max_output",))
def _nms_pallas_jit(boxes, scores, max_output: int, iou_threshold):
    n = boxes.shape[0]
    n_pad = (n + 127) // 128 * 128
    boxes_t = jnp.pad(boxes.T.astype(jnp.float32),
                      ((0, 0), (0, n_pad - n)))
    scores_p = jnp.pad(scores.astype(jnp.float32), (0, n_pad - n),
                       constant_values=NEG)[None, :]
    thr = jnp.asarray(iou_threshold, jnp.float32).reshape(1)
    m_pad = (max_output + 127) // 128 * 128

    kern = partial(_nms_kernel, max_output=m_pad, n=n_pad)
    idx, valid = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, m_pad), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(boxes_t, scores_p, thr)
    return idx[0, :max_output], valid[0, :max_output] == 1


def non_max_suppression_pallas(boxes, scores, max_output: int,
                               iou_threshold: float = 0.5,
                               score_threshold: float = float("-inf")):
    """Drop-in for ops.nms.non_max_suppression (same contract)."""
    scores = jnp.where(scores > score_threshold, scores, NEG)
    # cap the greedy loop at the candidate count (selections can't exceed n)
    return _nms_pallas_jit(boxes, scores, max_output, iou_threshold)
