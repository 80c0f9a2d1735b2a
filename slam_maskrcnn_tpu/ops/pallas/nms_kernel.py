"""Pallas greedy NMS kernels.

The XLA reference implementation (ops/nms.py) is a lax.scan whose
per-iteration cost is dominated by loop overhead (~20 us/iter measured,
PERFORMANCE.md) — 1000 selections cost ~20 ms. Two Pallas forms:

* "argmax" (default): per-selection kernel (all state in VMEM, one
  argmax + one IoU row per selection) — measured 2.2 ms/call at
  n=6144/cap=1000 including dispatch.
* "sorted": score-sort outside the kernel, then a tiled scan — within
  each 128-lane tile a fori_loop walks candidates on ONE vreg of state;
  a resolved tile suppresses all later boxes with a dense [128, n] IoU
  block. Loses to argmax at proposal scale (4.3 ms — the dense blocks
  cost more than the argmaxes saved) and compiles 100x slower in
  Mosaic; kept as a second oracle and for small-n/large-cap shapes.

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


def _nms_sorted_kernel(boxes_ref, thr_ref, sup_ref, *, n: int):
    """Greedy NMS over score-DESC-sorted boxes [4, n]: writes the
    suppression mask (1 = killed by an earlier kept box).

    With sorted input, selection order = lane order, so no per-iteration
    argmax is needed. Two-level structure bounds the sequential work:

    * within each 128-lane tile, a fori_loop walks the 128 candidates —
      all state is ONE vreg ([1, 128]);
    * after a tile resolves, its kept boxes suppress ALL later boxes at
      once with a dense [128, n] IoU block — pure VPU, no loop.

    The max_output cap needs no handling here: greedy-with-cap keeps
    exactly the first `cap` entries of the uncapped kept sequence
    (suppression by kept boxes beyond the cap can only affect boxes that
    the cap already excludes), so the caller slices the kept list."""
    iou_threshold = thr_ref[0]
    y1 = boxes_ref[0:1, :]
    x1 = boxes_ref[1:2, :]
    y2 = boxes_ref[2:3, :]
    x2 = boxes_ref[3:4, :]
    areas = (y2 - y1) * (x2 - x1)
    lanes128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sup_ref[:] = jnp.zeros((1, n), jnp.float32)

    def tile_body(t, _):
        t0 = pl.multiple_of(t * 128, 128)

        def dslice(row):  # lane-aligned window read from the REF (Mosaic
            return boxes_ref[row:row + 1, pl.ds(t0, 128)]  # has no value
            # dynamic_slice)

        ty1, tx1, ty2, tx2 = dslice(0), dslice(1), dslice(2), dslice(3)
        tarea = (ty2 - ty1) * (tx2 - tx1)
        tsup = sup_ref[:, pl.ds(t0, 128)]

        def cand_body(i, tsup):
            oh = (lanes128 == i).astype(jnp.float32)
            alive = 1.0 - jnp.sum(tsup * oh)   # 0 if already suppressed
            by1 = jnp.sum(ty1 * oh)
            bx1 = jnp.sum(tx1 * oh)
            by2 = jnp.sum(ty2 * oh)
            bx2 = jnp.sum(tx2 * oh)
            barea = (by2 - by1) * (bx2 - bx1)
            iy = jnp.maximum(jnp.minimum(ty2, by2)
                             - jnp.maximum(ty1, by1), 0.0)
            ix = jnp.maximum(jnp.minimum(tx2, bx2)
                             - jnp.maximum(tx1, bx1), 0.0)
            inter = iy * ix
            iou = inter / jnp.maximum(tarea + barea - inter, 1e-10)
            kill = ((iou > iou_threshold) & (lanes128 > i)).astype(
                jnp.float32) * alive
            return jnp.maximum(tsup, kill)

        tsup = jax.lax.fori_loop(0, 128, cand_body, tsup)
        sup_ref[:, pl.ds(t0, 128)] = tsup

        # kept boxes of this tile suppress all later boxes densely
        kept = 1.0 - tsup                       # [1, 128]
        gy1 = jnp.broadcast_to(ty1.reshape(128, 1), (128, n))
        gx1 = jnp.broadcast_to(tx1.reshape(128, 1), (128, n))
        gy2 = jnp.broadcast_to(ty2.reshape(128, 1), (128, n))
        gx2 = jnp.broadcast_to(tx2.reshape(128, 1), (128, n))
        iy = jnp.maximum(jnp.minimum(gy2, y2) - jnp.maximum(gy1, y1), 0.0)
        ix = jnp.maximum(jnp.minimum(gx2, x2) - jnp.maximum(gx1, x1), 0.0)
        inter = iy * ix
        ga = (gy2 - gy1) * (gx2 - gx1)
        iou = inter / jnp.maximum(ga + areas - inter, 1e-10)
        lanes_n = jax.lax.broadcasted_iota(jnp.int32, (128, n), 1)
        later = lanes_n >= (t0 + 128)
        killed = ((iou > iou_threshold) & later
                  & (kept.reshape(128, 1) > 0.5)).astype(jnp.float32)
        sup_ref[:] = jnp.maximum(sup_ref[:], killed.max(axis=0,
                                                        keepdims=True))
        return 0

    jax.lax.fori_loop(0, n // 128, tile_body, 0)


@partial(jax.jit, static_argnames=("max_output",))
def _nms_pallas_sorted_jit(boxes, scores, max_output: int, iou_threshold):
    """Sort-then-scan NMS: lax.sort by score desc, the Pallas kernel marks
    suppressions in order, the kept list is recovered with a small
    nonzero. See module docstring for when this form wins."""
    n = boxes.shape[0]
    n_pad = (n + 127) // 128 * 128
    scores_p = jnp.pad(scores.astype(jnp.float32), (0, n_pad - n),
                       constant_values=NEG)
    boxes_p = jnp.pad(boxes.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    order_key = -scores_p
    idx0 = jnp.arange(n_pad, dtype=jnp.int32)
    # two sort keys: score desc, ties by original index (TF top_k order)
    _, sidx, sy1, sx1, sy2, sx2, ssc = jax.lax.sort(
        (order_key, idx0, boxes_p[:, 0], boxes_p[:, 1], boxes_p[:, 2],
         boxes_p[:, 3], scores_p), dimension=0, num_keys=2)
    boxes_t = jnp.stack([sy1, sx1, sy2, sx2], axis=0)
    thr = jnp.asarray(iou_threshold, jnp.float32).reshape(1)

    kern = partial(_nms_sorted_kernel, n=n_pad)
    [sup] = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, n_pad), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(boxes_t, thr)
    keep = (sup[0] < 0.5) & (ssc > NEG / 2)
    (sel,) = jnp.nonzero(keep, size=max_output, fill_value=n_pad)
    ok = sel < n_pad
    sel_c = jnp.minimum(sel, n_pad - 1)
    return jnp.where(ok, sidx[sel_c], 0), ok


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
                               score_threshold: float = float("-inf"),
                               variant: str = "argmax"):
    """Drop-in for ops.nms.non_max_suppression (same contract: indices in
    selection order + validity mask). `variant`: "argmax" (per-selection
    kernel — default; measured 2.2 ms/call at n=6144/cap=1000 incl.
    dispatch) or "sorted" (sort + tiled scan; loses here — 4.3 ms — its
    dense per-tile suppression blocks outweigh the argmax savings at
    these sizes, and its Mosaic compile is 100x slower)."""
    scores = jnp.where(scores > score_threshold, scores, NEG)
    if variant == "sorted":
        return _nms_pallas_sorted_jit(boxes, scores, max_output,
                                      iou_threshold)
    return _nms_pallas_jit(boxes, scores, max_output, iou_threshold)
