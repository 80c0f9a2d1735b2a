"""Pallas PyramidROIAlign — the second named TPU-custom op (SURVEY §2.4(8)).

Replaces ``tf.image.crop_and_resize`` + level routing
(``Mask_RCNN/mrcnn/model.py:350-455``). The XLA path (ops/roi_align.py)
lowers to 4 corner gathers per sample point per level — the measured
bottleneck class (~12-18 ns/index, PERFORMANCE.md): 1000 ROIs x 49 samples
x 4 corners x 4 levels ≈ 12 ms of gathers. This kernel has ZERO gathers:

* FPN level routing bounds sqrt(h*w) at ≤ ~20 feature cells at the
  assigned level (that is the point of the ``log2(sqrt(hw)/(224/sqrt(A)))``
  rule; only the P5 clip admits bigger boxes, and P5 itself is ≤ 32x32 for
  IMAGE_MAX_DIM ≤ 1024). Routing does NOT bound the aspect ratio, so the
  static rect is 48x48: after the 8-cell DMA alignment loss it covers any
  box of aspect ≤ ~4 (span ≤ 40 cells). More-elongated boxes have their
  sample points clamped to the rect edge (their pooled features are
  approximate) and are counted in a ``misses`` scalar — same safety-valve
  contract as the fuse kernel.
* Bilinear interpolation is separable: out[p,q,c] = Σ_{h,w} Wy[p,h] Wx[q,w]
  rect[h,w,c] with hat-function weights Wy[p,h] = max(0, 1-|y_p - h|).
  Flattening (p,q) and (h,w) makes it ONE MXU matmul per ROI:
  W2 [P², 1024] @ rect [1024, C]. The weights are built from iotas on the
  VPU — no table, no gather; tf.crop_and_resize's extrapolation_value=0 is
  the in-range mask folded into the weights.
* The rect DMA dominates (48x48x256 bf16 = 1.2 MB worst case; the TIERS
  dispatch below cuts the common case 6x); GROUP ROIs are prefetched per
  grid step so copies overlap compute.

Parity: tests/test_roi_align_pallas.py asserts against the jnp oracle
(crop_and_resize) in interpret mode; bf16 rects give ~1e-2 relative
agreement (inference-grade), f32 is exact to 1e-5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_maskrcnn_tpu.ops.roi_align import roi_level

RECT = 48          # rect side in cells (covers routed boxes of aspect <= 4)
GROUP = 8          # ROIs per grid step
# DMA window tiers (rows, cols), smallest first; the last MUST be
# (RECT, RECT). FPN routing bounds sqrt(h*w) to ~7-14 cells at the
# assigned level, so an aspect<=1.3 box fits (16, 24) (cols carry up to
# 7 cells of 8-alignment slack) and the full rect moves only for
# elongated/P5-clamped boxes: the per-ROI copy is the kernel's
# bandwidth bound (48x48x256 bf16 = 1.2 MB), and the tier cuts it 6x
# for the common case. Stale scratch outside a tier window is harmless:
# the hat weights vanish beyond the tier rows/cols whenever the tier
# fits (prep guarantees it), and step 0 zero-fills the scratch so the
# dead region can never hold NaN bits (0 * NaN would poison the MXU
# accumulation).
TIERS = ((16, 24), (32, 32), (RECT, RECT))


def _roi_align_kernel(origins_ref,   # SMEM i32 [Ng*3]: (lvl+4*tier, y0, x0)
                      scal_ref,      # SMEM f32 [Ng*8]: ys0 xs0 sy sx hl1 wl1
                      l0, l1, l2, l3,  # HBM [Hp, Wp, C] feature levels
                      out_ref,       # VMEM [G, PR, C]
                      miss_ref,      # SMEM [1, 1] i32
                      rect, sems,    # scratch: [G, RECT, RECT, C], DMA sems
                      *, C: int, pool: int, p_pad: int):
    step = pl.program_id(0)
    levels = (l0, l1, l2, l3)

    @pl.when(step == 0)
    def _():
        miss_ref[0, 0] = 0
        # zero the rect scratch ONCE: tiered copies leave the window's
        # complement stale, and step 0's "stale" is uninitialized VMEM —
        # finite zeros make the zero-weight dead region exactly dead
        rect[...] = jnp.zeros((GROUP, RECT, RECT, C), rect.dtype)

    for g in range(GROUP):
        r = step * GROUP + g
        y0 = origins_ref[r * 3 + 1]
        x0 = pl.multiple_of(origins_ref[r * 3 + 2], 8)
        for li in range(4):
            for ti, (th, tw) in enumerate(TIERS):
                @pl.when(origins_ref[r * 3] == li + 4 * ti)
                def _(li=li, g=g, y0=y0, x0=x0, th=th, tw=tw):
                    pltpu.make_async_copy(
                        levels[li].at[pl.ds(y0, th), pl.ds(x0, tw), :],
                        rect.at[g, pl.ds(0, th), pl.ds(0, tw)],
                        sems.at[g]).start()

    PR = p_pad * p_pad
    RHW = RECT * RECT
    row = jax.lax.broadcasted_iota(jnp.int32, (PR, RHW), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (PR, RHW), 1)
    pf = (row // p_pad).astype(jnp.float32)
    qf = (row % p_pad).astype(jnp.float32)
    hf = (col // RECT).astype(jnp.float32)
    wf = (col % RECT).astype(jnp.float32)

    for g in range(GROUP):
        r = step * GROUP + g
        ys0 = scal_ref[r * 8 + 0]
        xs0 = scal_ref[r * 8 + 1]
        sy = scal_ref[r * 8 + 2]
        sx = scal_ref[r * 8 + 3]
        hl1 = scal_ref[r * 8 + 4]
        wl1 = scal_ref[r * 8 + 5]
        y0f = origins_ref[r * 3 + 1].astype(jnp.float32)
        x0f = origins_ref[r * 3 + 2].astype(jnp.float32)

        ys = ys0 + pf * sy            # absolute sample row (cells)
        xs = xs0 + qf * sx
        ok_y = (ys >= 0.0) & (ys <= hl1) & (pf < pool)
        ok_x = (xs >= 0.0) & (xs <= wl1) & (qf < pool)
        # rect-relative sample coords, clamped to the covered window;
        # clamping only bites for aspect > ~4 boxes — counted as misses
        yr = ys - y0f
        xr = xs - x0f
        yc = jnp.clip(yr, 0.0, RECT - 1.0)
        xc = jnp.clip(xr, 0.0, RECT - 1.0)
        miss_ref[0, 0] += jnp.sum(
            ((ok_y & ok_x) & ((yc != yr) | (xc != xr))
             & (col == 0)).astype(jnp.int32))  # once per sample point
        # hat-function bilinear weights; out-of-image samples get zero
        # weight (tf extrapolation_value=0)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(yc - hf))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xc - wf))
        w2 = jnp.where(ok_y & ok_x, wy * wx, 0.0)

        # reconstruct the exact copy descriptor for the wait (an
        # interpret-mode wait with a mismatched source would re-read the
        # wrong level; on hardware only the byte count matters)
        y0 = origins_ref[r * 3 + 1]
        x0 = pl.multiple_of(origins_ref[r * 3 + 2], 8)
        for li in range(4):
            for ti, (th, tw) in enumerate(TIERS):
                @pl.when(origins_ref[r * 3] == li + 4 * ti)
                def _(li=li, g=g, y0=y0, x0=x0, th=th, tw=tw):
                    pltpu.make_async_copy(
                        levels[li].at[pl.ds(y0, th), pl.ds(x0, tw), :],
                        rect.at[g, pl.ds(0, th), pl.ds(0, tw)],
                        sems.at[g]).wait()
        rg = rect[g].reshape(RHW, C)
        out_ref[g] = jnp.dot(w2.astype(rg.dtype), rg,
                             preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("pool_size", "image_shape",
                                   "compute_dtype", "return_misses"))
def pyramid_roi_align_pallas(features, boxes: jax.Array, pool_size: int,
                             image_shape, compute_dtype=jnp.bfloat16,
                             return_misses: bool = False):
    """Drop-in for ops.roi_align.pyramid_roi_align (same contract).

    features: (P2, P3, P4, P5) each [Hl, Wl, C] with C % 128 == 0;
    boxes [N, 4] normalized. Returns [N, pool, pool, C] float32
    (plus the clamped-sample count if return_misses).
    """
    assert len(features) == 4
    C = features[0].shape[-1]
    assert C % 128 == 0, f"channels {C} must be lane-aligned"
    assert max(image_shape[:2]) <= 1024, \
        f"RECT={RECT} rect coverage proven only for IMAGE_MAX_DIM <= 1024"
    N = boxes.shape[0]
    boxes = jax.lax.stop_gradient(boxes)

    # pad every level to >= RECT and multiples of 8 on W (DMA alignment);
    # padding is zeros, but samples never reach it (weights are masked to
    # the true level extent)
    feats, true_dims, pad_dims = [], [], []
    for f in features:
        Hl, Wl = f.shape[:2]
        Hp = max(RECT, Hl)
        Wp = max(RECT, (Wl + 7) // 8 * 8)
        if (Hp, Wp) != (Hl, Wl):
            f = jnp.pad(f, ((0, Hp - Hl), (0, Wp - Wl), (0, 0)))
        feats.append(f.astype(compute_dtype))
        true_dims.append((Hl, Wl))
        pad_dims.append((Hp, Wp))

    lvl = roi_level(boxes, image_shape)          # [N] in [2, 5]
    li = lvl - 2
    hl1 = jnp.asarray([d[0] - 1 for d in true_dims], jnp.float32)[li]
    wl1 = jnp.asarray([d[1] - 1 for d in true_dims], jnp.float32)[li]
    hp = jnp.asarray([d[0] for d in pad_dims], jnp.int32)[li]
    wp = jnp.asarray([d[1] for d in pad_dims], jnp.int32)[li]

    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    if pool_size > 1:
        ys0 = y1 * hl1
        xs0 = x1 * wl1
        sy = (y2 - y1) * hl1 / (pool_size - 1)
        sx = (x2 - x1) * wl1 / (pool_size - 1)
    else:
        ys0 = 0.5 * (y1 + y2) * hl1
        xs0 = 0.5 * (x1 + x2) * wl1
        sy = jnp.zeros_like(ys0)
        sx = jnp.zeros_like(xs0)

    y_lo = jnp.minimum(ys0, ys0 + sy * (pool_size - 1))
    x_lo = jnp.minimum(xs0, xs0 + sx * (pool_size - 1))
    y0 = jnp.clip(jnp.floor(y_lo).astype(jnp.int32), 0, hp - RECT)
    x0 = jnp.floor(x_lo).astype(jnp.int32)
    x0 = jnp.clip(x0 - (x0 % 8), 0, wp - RECT)

    # DMA tier: the hat weights touch window rows [0, floor(y_hi)+2-y0)
    # and cols [0, floor(x_hi)+2-x0) — pick the smallest TIERS entry that
    # contains them (the last always does; beyond-RECT boxes clamp and
    # count misses exactly as before)
    y_hi = jnp.maximum(ys0, ys0 + sy * (pool_size - 1))
    x_hi = jnp.maximum(xs0, xs0 + sx * (pool_size - 1))
    y_need = jnp.floor(y_hi).astype(jnp.int32) + 2 - y0
    x_need = jnp.floor(x_hi).astype(jnp.int32) + 2 - x0
    tier = jnp.full_like(y0, len(TIERS) - 1)
    for ti in range(len(TIERS) - 2, -1, -1):
        th, tw = TIERS[ti]
        tier = jnp.where((y_need <= th) & (x_need <= tw), ti, tier)

    n_pad = (N + GROUP - 1) // GROUP * GROUP
    def padn(a):
        return jnp.pad(a, (0, n_pad - N))
    origins = jnp.stack([padn(li + 4 * tier), padn(y0), padn(x0)],
                        -1).reshape(-1)
    scal = jnp.stack([padn(ys0), padn(xs0), padn(sy), padn(sx),
                      padn(hl1), padn(wl1),
                      jnp.zeros(n_pad), jnp.zeros(n_pad)],
                     -1).reshape(-1).astype(jnp.float32)

    p_pad = (pool_size + 7) // 8 * 8
    PR = p_pad * p_pad
    kern = partial(_roi_align_kernel, C=C, pool=pool_size, p_pad=p_pad)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((GROUP, PR, C), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, PR, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((GROUP, RECT, RECT, C), compute_dtype),
            pltpu.SemaphoreType.DMA((GROUP,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(origins, scal, *feats)
    out, miss = out

    out = out[:N].reshape(N, p_pad, p_pad, C)
    out = out[:, :pool_size, :pool_size, :]
    if return_misses:
        return out, miss[0, 0]
    return out
