"""ROIAlign: bilinear crop-and-resize + FPN pyramid level routing.

Replaces the second TF-native op the reference depends on,
``tf.image.crop_and_resize`` inside ``PyramidROIAlign``
(``Mask_RCNN/mrcnn/model.py:350-455``, SURVEY §2.4(8)).

TPU-native design: the reference splits ROIs by pyramid level with dynamic
``tf.where`` + re-sort (model.py:405-449) — dynamic shapes. Here every ROI
is sampled from all 4 levels with fixed shapes and the result selected by
the ROI's level mask; 4x redundant FLOPs on a tiny tensor in exchange for a
single fused static-shape program (the gathers, not FLOPs, dominate and
those are per-level masked anyway). A Pallas variant can fuse the
gather+lerp per level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def crop_and_resize(image: jax.Array, boxes: jax.Array,
                    crop_size: tuple[int, int]) -> jax.Array:
    """Bilinear crop-and-resize, tf.image.crop_and_resize semantics.

    image: [H, W, C]; boxes: [N, 4] normalized (y1, x1, y2, x2);
    returns [N, ch, cw, C]. Sample grid: in_y = y1*(H-1) + i*(y2-y1)*(H-1)/(ch-1),
    bilinear, 0 outside the image (extrapolation_value=0).
    """
    H, W, C = image.shape
    ch, cw = crop_size
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    iy = jnp.arange(ch, dtype=jnp.float32)
    ix = jnp.arange(cw, dtype=jnp.float32)
    if ch > 1:
        ys = y1[:, None] * (H - 1) + iy[None, :] * ((y2 - y1) * (H - 1) / (ch - 1))[:, None]
    else:
        ys = 0.5 * (y1 + y2)[:, None] * (H - 1) * jnp.ones((1, ch))
    if cw > 1:
        xs = x1[:, None] * (W - 1) + ix[None, :] * ((x2 - x1) * (W - 1) / (cw - 1))[:, None]
    else:
        xs = 0.5 * (x1 + x2)[:, None] * (W - 1) * jnp.ones((1, cw))

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        flat = image.reshape(H * W, C)
        return jnp.take(flat, yi * W + xi, axis=0)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # corners: [N, ch, cw, C]
    def corner(dy, dx):
        yy = (y0i + dy)[:, :, None]
        xx = (x0i + dx)[:, None, :]
        return gather(jnp.broadcast_to(yy, (len(boxes), ch, cw)),
                      jnp.broadcast_to(xx, (len(boxes), ch, cw)))

    wy = (ys - y0)[:, :, None, None]
    wx = (xs - x0)[:, None, :, None]
    top = corner(0, 0) * (1 - wx) + corner(0, 1) * wx
    bot = corner(1, 0) * (1 - wx) + corner(1, 1) * wx
    out = top * (1 - wy) + bot * wy

    # out-of-range samples -> 0 (extrapolation)
    oob = ((ys < 0) | (ys > H - 1))[:, :, None] | ((xs < 0) | (xs > W - 1))[:, None, :]
    return jnp.where(oob[..., None], 0.0, out)


def roi_level(boxes: jax.Array, image_shape, min_level=2, max_level=5,
              canonical_size=224.0) -> jax.Array:
    """FPN level per ROI (normalized boxes): the reference's
    ``log2(sqrt(h*w) / (224 / sqrt(image_area)))`` routing rule
    (model.py:375-384), clipped to [2, 5]. Returns i32 [N]."""
    h = boxes[:, 2] - boxes[:, 0]
    w = boxes[:, 3] - boxes[:, 1]
    img_area = float(image_shape[0] * image_shape[1])
    scale = jnp.sqrt(jnp.maximum(h * w, 1e-12)) / (canonical_size / jnp.sqrt(img_area))
    # 4 + round(log2(scale)) with round-half-to-even, = tf.round in the
    # reference (model.py:382-384); jnp.round matches.
    lvl = 4 + jnp.round(jnp.log2(jnp.maximum(scale, 1e-12)))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def pyramid_roi_align_auto(features, boxes, pool_size: int, image_shape):
    """Backend-dispatched PyramidROIAlign for the inference graph: the
    Pallas rect-DMA + separable-matmul kernel on TPU (zero gathers,
    ops/pallas/roi_align_kernel.py), this module's jnp path elsewhere.
    Training keeps the jnp path — the kernel defines no VJP."""
    if (jax.default_backend() == "tpu"
            and features[0].shape[-1] % 128 == 0
            and max(image_shape[:2]) <= 1024):
        from slam_maskrcnn_tpu.ops.pallas.roi_align_kernel import (
            pyramid_roi_align_pallas)
        return pyramid_roi_align_pallas(features, boxes, pool_size,
                                        tuple(image_shape[:2]))
    return pyramid_roi_align(features, boxes, pool_size, image_shape)


@partial(jax.jit, static_argnames=("pool_size", "image_shape"))
def pyramid_roi_align(features: tuple[jax.Array, ...], boxes: jax.Array,
                      pool_size: int, image_shape) -> jax.Array:
    """ROIAlign over an FPN pyramid. = ``PyramidROIAlign``
    (model.py:350-455), static shapes.

    features: (P2, P3, P4, P5) each [Hl, Wl, C]; boxes [N, 4] normalized.
    Returns [N, pool, pool, C].
    """
    boxes = jax.lax.stop_gradient(boxes)  # model.py:427 uses stop_gradient
    lvl = roi_level(boxes, image_shape)
    out = jnp.zeros((boxes.shape[0], pool_size, pool_size,
                     features[0].shape[-1]), features[0].dtype)
    for i, feat in enumerate(features):
        crops = crop_and_resize(feat, boxes, (pool_size, pool_size))
        out = jnp.where((lvl == i + 2)[:, None, None, None], crops, out)
    return out
