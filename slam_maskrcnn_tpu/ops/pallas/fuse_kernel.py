"""Pallas TSDF fusion kernel — the TPU-native hot path.

Why this exists (see PERFORMANCE.md): XLA lowers the fusion update's
image lookups as generic gathers at ~12 ns/index — 3 gathers x 16.7M
voxels ≈ 650 ms/frame at 256³. This kernel eliminates ALL gathers:

* The volume lives in a **blocked layout**: blocks of (8, 8, 32) voxels
  stored as [NB, 16, 128] tiles (native VPU tiling; z is minor for spatial
  coherence). The instance histogram is [NB, K, 16, 128] u16.
* Per block, the projected image footprint is a small rect (perspective
  projection of a 4.4 x 4.4 x 17.6 cm box at ~1 m is tens of pixels).
  The kernel DMAs that rect (static size RECT_H x RECT_W, dynamic
  position, positions precomputed densely in XLA from the 8 block
  corners) into VMEM.
* Pixel lookup inside the rect: per sublane row of the voxel tile, a
  **tpu.dynamic_gather** along the rect's lanes + a one-hot contraction
  of the sublane dim on the VPU (``_rect_lookup_gather``) — exact f32
  passthrough, zero MXU work. Two orientations: "gather" over the
  [H, W] table and "gather_t" over a transposed [W', H'] table (the
  8-slack DMA sublane alignment then lands on u and the rect shrinks
  from (96, 256) to (64, 256)). The original int8 one-hot MXU matmul
  lookup is kept as "matmul" (``_rect_lookup_matmul``); it lost because
  its [2048, RECT_W*6] int32 output forced ~10k post-matmul VPU
  vreg-ops per block (measured 93.6 -> 22 ms/frame at 256^3).
  Depth+mask and the 3 color bytes are packed into two f32 tables
  (<2^24, so f32 integer arithmetic is exact).
* The per-voxel instance histogram is stored voxel-major as
  [NB, BLOCK_VOX*K/128, 128] — 128-lane rows of 128/K voxels' contiguous
  K-bin groups (row r holds voxels 4r..4r+3 for K=32). This is the
  row-gather-native layout: the splat probe/renderer fetch a pixel's full
  histogram with ONE fast row gather + a lane one-hot select (~35 ms for
  307k pixels measured) — the [16, 128*K] view of the same bytes would
  need (1,1,K)-slice gathers, which XLA executes ~50x slower (~2.3 us
  per slice, measured; see PERFORMANCE.md). The in-kernel update builds
  the one-hot in this layout via a tiny row-select matmul + Mosaic's
  equal-shape take_along_axis (tpu.dynamic_gather).

Semantics are bit-identical to fusion/fuse.py (same reference parity,
src/SfM_CUDA/tsdf.cu:18-70) except voxels whose projected pixel falls
outside their block's rect (geometrically impossible unless the footprint
exceeds RECT_H x RECT_W, e.g. a camera inside the volume); those are
counted in the returned `misses` scalar so callers can fall back to the
exact XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_maskrcnn_tpu.fusion.state import FusionConfig, TSDFState

# block geometry: (BX, BY, BZ) voxels per block -> [16, 128] tile
BX, BY, BZ = 8, 8, 32
BLOCK_VOX = BX * BY * BZ  # 2048
TILE_S, TILE_L = 16, 128
RECT_H, RECT_W = 128, 256  # 128-lane-aligned DMA starts need 128 slack in w
GROUP = 16  # blocks per grid step
# DMA pipeline depth: copies for grid step s+NSLOT-1 are issued during
# step s (scratch slot = step % NSLOT). Measured at 512^3: depth 2
# recovered ~2 ms; depth 3 was NEUTRAL (30.0 vs 29.9 ms) — so the
# 11.6 ms gather_nodma delta is not landing latency but DMA *op count*
# (~350 ns per start/wait across 2 copies x 8k visible blocks, measured
# by elimination). The lever that would cut it is one SHARED rect DMA
# per 16-block z-column group (their footprints overlap heavily) with
# per-block row windows into the shared scratch — future work.
NSLOT = 2


class BlockedTSDFState(struct.PyTreeNode):
    """Volume state in blocked layout (the fast-path canonical form)."""

    diff: jax.Array      # f32 [NB, 16, 128]
    colorpk: jax.Array   # f32 [NB, 16, 128]  b + g*256 + r*65536
    weight: jax.Array    # i32 [NB, 16, 128]
    hist: jax.Array      # u16 [NB, 2048*K/128, 128]  row r = voxels
    #                      [r*128//K, ...), lane = (v % (128//K))*K + k
    vol_start: jax.Array
    vol_end: jax.Array
    voxel: jax.Array
    mu: jax.Array
    n_obs: jax.Array
    num_objs: jax.Array
    nbx: int = struct.field(pytree_node=False)
    nby: int = struct.field(pytree_node=False)
    nbz: int = struct.field(pytree_node=False)


def _block_dims(dim):
    assert dim[0] % BX == 0 and dim[1] % BY == 0 and dim[2] % BZ == 0, \
        f"vol_dim {dim} must be divisible by {(BX, BY, BZ)}"
    return dim[0] // BX, dim[1] // BY, dim[2] // BZ


def to_blocked(state: TSDFState, cfg: FusionConfig) -> BlockedTSDFState:
    """Dense [X,Y,Z] -> blocked [NB,16,128] (pure reshape/transpose)."""
    dim = cfg.vol_dim
    nbx, nby, nbz = _block_dims(dim)
    NB = nbx * nby * nbz

    def blk(a):  # [X,Y,Z] -> [NB,16,128]
        a = a.reshape(nbx, BX, nby, BY, nbz, BZ)
        a = a.transpose(0, 2, 4, 1, 3, 5)
        return a.reshape(NB, TILE_S, TILE_L)

    color = state.color.astype(jnp.float32)
    colorpk = color[..., 0] + color[..., 1] * 256.0 + color[..., 2] * 65536.0
    K = state.hist.shape[-1]
    assert 128 % K == 0, f"max_objects {K} must divide 128"
    h = state.hist.reshape(nbx, BX, nby, BY, nbz, BZ, K)
    h = h.transpose(0, 2, 4, 1, 3, 5, 6)  # [nbx,nby,nbz, BX,BY,BZ, K]
    bdt = jnp.uint8 if state.hist.dtype == jnp.uint8 else jnp.uint16
    h = h.reshape(NB, BLOCK_VOX * K // 128, 128).astype(bdt)
    return BlockedTSDFState(
        diff=blk(state.diff), colorpk=blk(colorpk),
        weight=blk(state.weight), hist=h,
        vol_start=state.vol_start, vol_end=state.vol_end,
        voxel=state.voxel, mu=state.mu, n_obs=state.n_obs,
        num_objs=state.num_objs, nbx=nbx, nby=nby, nbz=nbz)


def init_blocked(cfg: FusionConfig, vol_start, vol_end,
                 num_objs: int = 0) -> BlockedTSDFState:
    """Allocate an empty blocked volume directly — converting a dense
    512^3 state would materialize a ~34 GB transpose intermediate."""
    dim = cfg.vol_dim
    nbx, nby, nbz = _block_dims(dim)
    NB = nbx * nby * nbz
    K = cfg.max_objects
    assert 128 % K == 0, f"max_objects {K} must divide 128"
    vol_start = jnp.asarray(vol_start, jnp.float32)
    vol_end = jnp.asarray(vol_end, jnp.float32)
    voxel = (vol_end - vol_start) / (jnp.asarray(dim, jnp.float32) - 1.0)
    mu = cfg.mu_factor * voxel[0]
    return BlockedTSDFState(
        diff=jnp.full((NB, TILE_S, TILE_L), mu, jnp.float32),
        colorpk=jnp.zeros((NB, TILE_S, TILE_L), jnp.float32),
        weight=jnp.zeros((NB, TILE_S, TILE_L), jnp.int32),
        hist=jnp.zeros((NB, BLOCK_VOX * K // 128, 128),
                       jnp.uint8 if cfg.hist_dtype == jnp.uint8
                       else jnp.uint16),
        vol_start=vol_start, vol_end=vol_end, voxel=voxel, mu=mu,
        n_obs=jnp.zeros((), jnp.int32),
        num_objs=jnp.asarray(num_objs, jnp.int32),
        nbx=nbx, nby=nby, nbz=nbz)


def init_blocked_from_first_frame(cfg: FusionConfig, depth, intrinsic,
                                  mean_depth, num_objs: int = 0):
    from slam_maskrcnn_tpu.fusion.state import volume_bbox_from_depth

    vs, ve = volume_bbox_from_depth(depth, intrinsic, mean_depth)
    return init_blocked(cfg, vs, ve, num_objs=num_objs)


def to_dense(b: BlockedTSDFState, cfg: FusionConfig) -> TSDFState:
    """Blocked -> dense TSDFState (for tests/rendering/export)."""
    nbx, nby, nbz = b.nbx, b.nby, b.nbz
    dim = (nbx * BX, nby * BY, nbz * BZ)

    def unblk(a):
        a = a.reshape(nbx, nby, nbz, BX, BY, BZ)
        a = a.transpose(0, 3, 1, 4, 2, 5)
        return a.reshape(dim)

    colorpk = b.colorpk
    blue = jnp.mod(colorpk, 256.0)
    green = jnp.mod(jnp.floor(colorpk / 256.0), 256.0)
    red = jnp.floor(colorpk / 65536.0)
    color = jnp.stack([unblk(blue), unblk(green), unblk(red)],
                      axis=-1).astype(jnp.uint8)
    K = b.hist.shape[1] * 128 // BLOCK_VOX
    h = b.hist.reshape(nbx, nby, nbz, BX, BY, BZ, K)
    h = h.transpose(0, 3, 1, 4, 2, 5, 6)
    h = h.reshape(dim + (K,)).astype(cfg.hist_dtype)
    mv = jnp.zeros((1, 1, 1), jnp.int32)
    return TSDFState(diff=unblk(b.diff), color=color, weight=unblk(b.weight),
                     hist=h, vol_start=b.vol_start, vol_end=b.vol_end,
                     voxel=b.voxel, mu=b.mu, n_obs=b.n_obs,
                     num_objs=b.num_objs, mv_id=mv, mv_cnt=mv)


def _pack_frame(depth, color, mask):
    """Two exact-in-f32 tables: depth+mask and bgr."""
    pk1 = depth.astype(jnp.float32) + mask.astype(jnp.float32) * 65536.0
    c = color.astype(jnp.float32)
    pk2 = c[..., 0] + c[..., 1] * 256.0 + c[..., 2] * 65536.0
    return pk1, pk2


def _block_origins(b: BlockedTSDFState, e2i, intrinsic, H, W,
                   rect_h=RECT_H, rect_w=RECT_W, img_h=None, img_w=None,
                   transposed: bool = False, rect_mid=None,
                   depth=None, depth_scale=1000.0, mu=None,
                   merge_mid: bool = False):
    """Rect origin (a0, b0) per block from the 8 projected corners (XLA,
    dense), where a is the DMA sublane dim (8-aligned starts) and b the
    lane dim (128-aligned starts). Normal orientation: (a, b) = (v, u)
    over the [H, W] packed table; transposed (the "gather_t" lookup):
    (a, b) = (u, v) over a [W', H'] transposed table — the cheap 8-slack
    alignment then lands on u and the rect shrinks. (H, W) are the stored
    TABLE dims; (img_h, img_w) the true image dims (default: the table's).
    Clamped so the rect stays inside the table.

    Layout note (r4e): all per-block math here runs on FLAT [NB] 1-D
    arrays. The natural [nbx, nby, nbz] shape has a 16-lane minor dim at
    512^3 — the narrow-lane layout cliff (CLAUDE.md) — and this function
    evaluates ~120 elementwise ops over it per frame."""
    nbx, nby, nbz = b.nbx, b.nby, b.nbz
    NB = nbx * nby * nbz
    idx = jnp.arange(NB, dtype=jnp.int32)
    bx = (idx // (nby * nbz)).astype(jnp.float32)
    by = ((idx // nbz) % nby).astype(jnp.float32)
    bz = (idx % nbz).astype(jnp.float32)
    E = e2i.astype(jnp.float32)
    Km = intrinsic.astype(jnp.float32)
    umin = jnp.full((NB,), np.inf, jnp.float32)
    vmin = jnp.full((NB,), np.inf, jnp.float32)
    umax = jnp.full((NB,), -np.inf, jnp.float32)
    vmax = jnp.full((NB,), -np.inf, jnp.float32)
    any_front = jnp.zeros((NB,), bool)
    all_front = jnp.ones((NB,), bool)
    zmin = jnp.full((NB,), np.inf, jnp.float32)
    zmax = jnp.full((NB,), -np.inf, jnp.float32)
    for cx in (0.0, BX):
        for cy in (0.0, BY):
            for cz in (0.0, BZ):
                px = b.vol_start[0] + (bx * BX + cx) * b.voxel[0]
                py = b.vol_start[1] + (by * BY + cy) * b.voxel[1]
                pz = b.vol_start[2] + (bz * BZ + cz) * b.voxel[2]
                cxx = E[0, 0] * px + E[0, 1] * py + E[0, 2] * pz + E[0, 3]
                cyy = E[1, 0] * px + E[1, 1] * py + E[1, 2] * pz + E[1, 3]
                czz = E[2, 0] * px + E[2, 1] * py + E[2, 2] * pz + E[2, 3]
                sz = jnp.where(jnp.abs(czz) < 1e-9, 1e-9, czz)
                u = (Km[0, 0] * cxx + Km[0, 2] * czz) / sz
                v = (Km[1, 1] * cyy + Km[1, 2] * czz) / sz
                # behind-camera corners poison the min with -inf; mark them
                u = jnp.where(czz > 1e-6, u, np.inf)
                v = jnp.where(czz > 1e-6, v, np.inf)
                umin = jnp.minimum(umin, u)
                vmin = jnp.minimum(vmin, v)
                umax = jnp.maximum(umax, jnp.where(czz > 1e-6, u, -np.inf))
                vmax = jnp.maximum(vmax, jnp.where(czz > 1e-6, v, -np.inf))
                any_front = any_front | (czz > 1e-6)
                all_front = all_front & (czz > 1e-6)
                zmin = jnp.minimum(zmin, czz)
                zmax = jnp.maximum(zmax, czz)
    if img_h is None:
        img_h, img_w = H, W
    if transposed:
        amin, amax, bmin, bmax = umin, umax, vmin, vmax
        img_a, img_b = img_w, img_h
    else:
        amin, amax, bmin, bmax = vmin, vmax, umin, umax
        img_a, img_b = img_h, img_w

    def rect_fit(rh, rw):
        """(a0, b0, too_big) for a given rect window size.

        DMA slice starts must respect the (8, 128) tiling: align down.
        The lane alignment forces rw >= footprint + 128. Only the
        IN-IMAGE part of the footprint must fit (off-image voxels never
        fuse): the bbox is clamped to the image before the coverage
        test. Clamp bounds stay aligned so aligned-ness survives."""
        a0 = jnp.floor((amin - 2.0) / 8.0).astype(jnp.int32) * 8
        b0 = jnp.floor((bmin - 2.0) / 128.0).astype(jnp.int32) * 128
        a_hi = (max(H - rh, 0) // 8) * 8
        b_hi = (max(W - rw, 0) // 128) * 128
        a0 = jnp.clip(a0, 0, a_hi)
        b0 = jnp.clip(b0, 0, b_hi)
        a0 = jnp.where(jnp.isfinite(amin), a0, 0)
        b0 = jnp.where(jnp.isfinite(bmin), b0, 0)
        too_big = ((jnp.minimum(amax, img_a - 1.0)
                    > (a0 + rh - 1).astype(jnp.float32))
                   | (jnp.minimum(bmax, img_b - 1.0)
                      > (b0 + rw - 1).astype(jnp.float32)))
        return a0, b0, too_big

    # visibility classes (a three-tier cascade — the per-block lookup
    # cost is ~linear in rect_h, so pass A runs the smallest rect and
    # outliers escalate):
    # * vis (pass A): all corners in front, projected bbox overlaps the
    #   image, and the bbox FITS the pass-A rect after alignment clamps.
    # * flag_mid (pass M, mid rect over a compacted subset): fits the
    #   mid rect but not the pass-A rect.
    # * flag_full (pass B, full-image rect): blocks straddling the
    #   camera plane (their projected bbox is unreliable — the hull of
    #   the front corners does not bound interior voxel projections) and
    #   near-camera blocks exceeding the mid rect. Pass B's rect is the
    #   whole image, so in-image voxels of flagged blocks always fuse
    #   exactly.
    a0, b0, too_big = rect_fit(rect_h, rect_w)
    partial_behind = any_front & ~all_front
    overlap = ((umax >= 0) & (umin <= img_w - 1)
               & (vmax >= 0) & (vmin <= img_h - 1))
    vis = all_front & overlap & ~too_big

    # ---- XLA-side free/behind pre-classification (cfg.pallas_preclass):
    # the kernel's uniform-block bounds, evaluated from a 32x32-pooled
    # depth min/max pyramid + the corner camera-z range, BEFORE launch.
    # Pre-classified blocks never DMA their rect or histogram (the DMA
    # traffic, not the lookup, is what the in-kernel check cannot save).
    # Conservative by construction: the pooled tile cover is a superset
    # of the true footprint (d_min_pool <= d_min_true) and the corner box
    # strictly contains all voxel centers; f32 rounding differences
    # between the kernel's per-voxel pz association and the corner bound
    # are absorbed by a 0.1 mm slack. free => every voxel valid with
    # dn == 1 (closed-form update, no rect); behind => every voxel
    # invalid (identity). Straddlers (partial_behind) are never
    # classified — the front-corner hull does not bound their interior
    # projections.
    free = jnp.zeros_like(vis)
    behind = jnp.zeros_like(vis)
    if depth is not None and mu is not None:
        T = 32
        ih, iw = depth.shape
        ph, pw = (-ih) % T, (-iw) % T
        d_f = depth.astype(jnp.float32)
        dmin_p = jnp.pad(d_f, ((0, ph), (0, pw)), constant_values=1e9)
        dmax_p = jnp.pad(d_f, ((0, ph), (0, pw)), constant_values=0.0)
        Hg, Wg = (ih + ph) // T, (iw + pw) // T
        dmin_p = dmin_p.reshape(Hg, T, Wg, T).min(axis=(1, 3))
        dmax_p = dmax_p.reshape(Hg, T, Wg, T).max(axis=(1, 3))
        fin = (jnp.isfinite(umin) & jnp.isfinite(vmin)
               & jnp.isfinite(umax) & jnp.isfinite(vmax))
        u0c = jnp.clip(jnp.floor(jnp.where(fin, umin, 0.0) / T),
                       0, Wg - 1).astype(jnp.int32)
        u1c = jnp.clip(jnp.floor(jnp.where(fin, umax, 0.0) / T),
                       0, Wg - 1).astype(jnp.int32)
        v0c = jnp.clip(jnp.floor(jnp.where(fin, vmin, 0.0) / T),
                       0, Hg - 1).astype(jnp.int32)
        v1c = jnp.clip(jnp.floor(jnp.where(fin, vmax, 0.0) / T),
                       0, Hg - 1).astype(jnp.int32)
        # lane-merged [NB, Hg*Wg] pool mask (a [NB, Hg, Wg] view has a
        # ~20-lane minor dim — the same layout cliff)
        gg = jnp.arange(Hg * Wg, dtype=jnp.int32)[None, :]
        gi = gg // Wg
        gj = gg % Wg
        m = ((gi >= v0c[:, None]) & (gi <= v1c[:, None])
             & (gj >= u0c[:, None]) & (gj <= u1c[:, None]))
        d_min = jnp.min(jnp.where(m, dmin_p.reshape(1, -1), 1e9), axis=1)
        d_max = jnp.max(jnp.where(m, dmax_p.reshape(1, -1), 0.0), axis=1)
        zlo, zhi = zmin - 1e-4, zmax + 1e-4
        bbox_in = (fin & (umin >= 0) & (umax <= img_w - 1)
                   & (vmin >= 0) & (vmax <= img_h - 1))
        free = (all_front & bbox_in & (d_min > 0)
                & (d_min / depth_scale - zhi >= mu))
        behind = (all_front & overlap
                  & (d_max / depth_scale - zlo <= -mu))
        vis = vis & ~behind & ~free

    if rect_mid is not None:
        am0, bm0, too_big_m = rect_fit(*rect_mid)
        mid_mask = (all_front & overlap & too_big & ~too_big_m
                    & ~free & ~behind)
        flag_full = any_front & (partial_behind
                                 | (overlap & too_big & too_big_m
                                    & ~free & ~behind))
        if merge_mid:
            # mid blocks fuse inside pass A as vis code 3 with MID
            # origins in the shared slots (frame_vmem window reads);
            # the separate compacted mid pass disappears
            a0 = jnp.where(mid_mask, am0, a0)
            b0 = jnp.where(mid_mask, bm0, b0)
            flag_mid = jnp.zeros_like(vis)
            origins_mid = None
        else:
            flag_mid = mid_mask
            origins_mid = jnp.stack(
                [am0.reshape(-1), bm0.reshape(-1)], axis=-1).reshape(-1)
    else:
        mid_mask = jnp.zeros_like(vis)
        flag_mid = jnp.zeros_like(vis)
        flag_full = any_front & (partial_behind
                                 | (overlap & too_big & ~free & ~behind))
        origins_mid = None
    # vis codes: 0 skip (invisible/behind), 1 full lookup, 2 free
    # closed-form (needs no rect, so free blocks resolve in pass A even
    # when their footprint exceeds every rect tier), 3 merged mid tier
    # (merge_mid only)
    vis_code = jnp.where(free, 2, vis.astype(jnp.int32))
    if merge_mid and rect_mid is not None:
        vis_code = jnp.where(mid_mask, 3, vis_code)
    # ONE packed i32 per block: code in bits 0-1, a0/8 in 2-13, b0/128 in
    # 14-19 (a0 is 8-aligned, b0 128-aligned by construction). SMEM is a
    # hard 1 MB and the old 3-word stride cost 768 KB at 512^3 — packed,
    # the table is 256 KB, leaving room for a second frame's table (the
    # pair mode) and the visit_compact lane lists. Static-dim bounds
    # guarantee the fields fit (tables are <= 4096*8 rows, <= 64*128
    # lanes wide).
    assert H // 8 < 4096 and W // 128 < 64, (H, W)
    origins = (vis_code | ((a0 >> 3) << 2) | ((b0 >> 7) << 14))
    return origins, flag_mid, flag_full, origins_mid


def _rect_lookup_gather(rect12_ref, vl, ul, ok,
                        rect_h: int, rect_w: int):
    """Per-voxel rect lookup via tpu.dynamic_gather — zero MXU work.

    For each of the 16 sublane rows of the (16, 128) voxel tile, gather
    every rect row's lane at that voxel's `ul` (Mosaic's equal-shape
    ``take_along_axis`` along <=128 lanes), then contract the v dimension
    with a one-hot mask on the VPU. Exact: the packed f32 values pass
    through untouched (no plane split, no matmul). Invalid voxels (`ok`
    false) read 0 -> d_raw == 0 -> invalid, matching the XLA path.

    BOTH packed tables live stacked in one [2*rect_h, rect_w] scratch
    (depth+mask rows 0:rect_h, color rows rect_h:) and one gather serves
    them together: the gather's cost is per-INVOCATION, not per-row
    (measured: halving rect_h moved the 512^3 fuse only 9%, while
    lookup=none removed 57 of 88 ms), so halving the call count halves
    the dominant term.

    Replaces the one-hot-matmul lookup (kept as _rect_lookup_matmul): the
    matmul itself was cheap, but its [2048, rect_w*6] int32 output forced
    ~10k post-matmul VPU vreg-ops per block (measured 93.6 -> 22 ms at
    256^3)."""
    H2 = 2 * rect_h
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (H2, TILE_L), 0)
    rows1, rows2 = [], []
    for s in range(TILE_S):
        ul_row = jnp.broadcast_to(ul[s:s + 1, :], (H2, TILE_L))
        vl_row = jnp.broadcast_to(vl[s:s + 1, :], (H2, TILE_L))
        ok_row = jnp.broadcast_to(ok[s:s + 1, :], (H2, TILE_L))
        vmask = (((v_iota == vl_row) | (v_iota == vl_row + rect_h))
                 & ok_row).astype(jnp.float32)
        acc1 = jnp.zeros((1, TILE_L), jnp.float32)
        acc2 = jnp.zeros((1, TILE_L), jnp.float32)
        for c in range(0, rect_w, TILE_L):
            idx = jnp.clip(ul_row - c, 0, TILE_L - 1)
            mc = vmask * (ul_row // TILE_L == c // TILE_L).astype(jnp.float32)
            g12 = jnp.take_along_axis(rect12_ref[:, c:c + TILE_L], idx,
                                      axis=1)
            prod = g12 * mc
            acc1 = acc1 + jnp.sum(prod[:rect_h], axis=0, keepdims=True)
            acc2 = acc2 + jnp.sum(prod[rect_h:], axis=0, keepdims=True)
        rows1.append(acc1)
        rows2.append(acc2)
    return (jnp.concatenate(rows1, axis=0), jnp.concatenate(rows2, axis=0))


def _rect_lookup_gather_banded(rect12_ref, vl, ul, ok,
                               rect_h: int, rect_w: int):
    """_rect_lookup_gather over the BANDED table layout: table-1 row v
    lives at banded row (v // 8) * 16 + v % 8, table-2 at +8 (the two
    packed frame tables interleave in 8-row bands so ONE rect DMA serves
    both — the DMA cost is per-START, not per-byte). Same gather count;
    the v one-hot matches the banded row ids and the two accumulators
    split by band parity via a sublane reshape."""
    H2 = 2 * rect_h
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (H2, TILE_L), 0)
    nb2 = H2 // 16
    rows1, rows2 = [], []
    for s in range(TILE_S):
        ul_row = jnp.broadcast_to(ul[s:s + 1, :], (H2, TILE_L))
        vl_row = jnp.broadcast_to(vl[s:s + 1, :], (H2, TILE_L))
        ok_row = jnp.broadcast_to(ok[s:s + 1, :], (H2, TILE_L))
        # banded target rows: r1 = v + 8*(v//8), r2 = r1 + 8
        vb = vl_row + ((vl_row >> 3) << 3)
        vmask = (((v_iota == vb) | (v_iota == vb + 8))
                 & ok_row).astype(jnp.float32)
        acc1 = jnp.zeros((1, TILE_L), jnp.float32)
        acc2 = jnp.zeros((1, TILE_L), jnp.float32)
        for c in range(0, rect_w, TILE_L):
            idx = jnp.clip(ul_row - c, 0, TILE_L - 1)
            if rect_w == TILE_L:
                # single-chunk window (the tight-tier fast path): every
                # masked lane's ul is inside the chunk by the dispatch
                # coverage test, so the chunk-match multiply is identity
                mc = vmask
            else:
                mc = vmask * (ul_row // TILE_L
                              == c // TILE_L).astype(jnp.float32)
            g12 = jnp.take_along_axis(rect12_ref[:, c:c + TILE_L], idx,
                                      axis=1)
            prod = (g12 * mc).reshape(nb2, 16, TILE_L)
            acc1 = acc1 + jnp.sum(prod[:, :8], axis=(0, 1), keepdims=False
                                  ).reshape(1, TILE_L)
            acc2 = acc2 + jnp.sum(prod[:, 8:], axis=(0, 1), keepdims=False
                                  ).reshape(1, TILE_L)
        rows1.append(acc1)
        rows2.append(acc2)
    return (jnp.concatenate(rows1, axis=0), jnp.concatenate(rows2, axis=0))


def _rect_lookup_matmul(rect1, rect2, vl, ul, ok, rh_i,
                        rect_h: int, rect_w: int):
    """Per-voxel rect lookup via one-hot int8 MXU matmul (the original
    scheme; see module docstring history). Kept as a fallback
    (cfg.pallas_lookup = "matmul")."""
    # column-layout copies for the one-hot gather (supported relayout:
    # (16,128) -> (1,2048) reshape -> transpose; bool relayouts are not
    # supported, so ok travels as i32)
    vl_c = vl.reshape(1, BLOCK_VOX).T
    ul_c = ul.reshape(1, BLOCK_VOX).T
    ok_c = ok.astype(jnp.int32).reshape(1, BLOCK_VOX).T == 1

    # row one-hot matmul (MXU) over both tables at once, then a column
    # one-hot select (VPU). `ok` folded into the one-hot so invalid
    # voxels read 0 (-> d_raw == 0 -> invalid, same as the XLA path).
    row_oh = ((vl_c == rh_i) & ok_c).astype(jnp.float32)
    # Exactness vs MXU rate: a default bf16 matmul would truncate the
    # packed f32 integers (<2^24), f32 Precision.HIGHEST costs ~6 bf16
    # passes. Instead decompose both tables into three 8-bit planes —
    # plane values <= 255 are bf16-exact, the one-hot left operand is
    # 0/1, and each output sums exactly one product — so a single-pass
    # bf16 matmul over the 6 planes is bit-exact at full MXU rate. The
    # planes recombine before the column select (sums of exact ints).
    both = jnp.concatenate([rect1, rect2], axis=1)
    p2 = jnp.floor(both / 65536.0)
    r16 = both - p2 * 65536.0
    p1 = jnp.floor(r16 / 256.0)
    p0 = r16 - p1 * 256.0
    # int8 MXU (2-4x the bf16 rate on v5e): plane bytes shift to
    # [-128, 127] to fit int8; one-term one-hot sums are exact in
    # int32, and the +128 offset is restored per voxel afterwards.
    planes = (jnp.concatenate([p0, p1, p2], axis=1)
              - 128.0).astype(jnp.int8)
    ti = jnp.dot(row_oh.astype(jnp.int8), planes,
                 preferred_element_type=jnp.int32)
    # recombine planes wide, then column-select per table (tried
    # the narrower select-per-plane ordering — 18 small selects —
    # and it measured ~35% SLOWER than these wide fused VPU ops)
    ok_i = ok_c.astype(jnp.int32) * 128
    t = (ti + ok_i).astype(jnp.float32)
    w2 = 2 * rect_w
    t12 = t[:, :w2] + 256.0 * t[:, w2:2 * w2] + 65536.0 * t[:, 2 * w2:]

    val1c = jnp.zeros((BLOCK_VOX, 1), jnp.float32)
    val2c = jnp.zeros((BLOCK_VOX, 1), jnp.float32)
    for c0 in range(0, rect_w, 128):
        oh_c = (ul_c == (jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_VOX, 128), 1) + c0)).astype(jnp.float32)
        val1c = val1c + jnp.sum(t12[:, c0:c0 + 128] * oh_c, axis=1,
                                keepdims=True)
        val2c = val2c + jnp.sum(
            t12[:, rect_w + c0:rect_w + c0 + 128] * oh_c, axis=1,
            keepdims=True)

    # back to the (16, 128) tile layout for the update math
    return (val1c.reshape(TILE_S, TILE_L), val2c.reshape(TILE_S, TILE_L))


def _fuse_kernel(origins_ref,  # SMEM scalar prefetch [N*ostride] i32
                 params_ref,   # SMEM [32] f32 packed scalars
                 pk1_hbm, pk2_hbm,  # HBM [Hp, Wp] f32
                 diff_ref, colorpk_ref, wt_ref, hist_ref,   # VMEM in
                 diff_out, colorpk_out, wt_out, hist_out,   # VMEM out
                 miss_ref,     # SMEM out [1, 1] i32
                 rect12, sems, hist_buf, hsem,  # scratch
                 dbuf, cbuf, wbuf, ssem,        # state_hbm staging slots
                 wfl,          # SMEM [4*NSLOT*group] deferred-write flags
                 *, K: int, H: int, W: int, nby: int, nbz: int,
                 rect_h: int, rect_w: int,
                 color_diff_gate: float, depth_scale: float,
                 group: int = GROUP, coords: str = "arith",
                 lookup: str = "gather", hist_hbm: bool = False,
                 state_hbm: bool = False, banded: bool = False,
                 frame_vmem: bool = False, defer_wb: bool = True,
                 uniform_skip: bool = True,
                 compact: bool = False, ids_off: int = 0,
                 merge_mid: bool = False, mid_h: int = 0, mid_w: int = 0,
                 visit_compact: bool = False, cnt_off: int = 0,
                 lanes_off: int = 0, pair: bool = False,
                 orig2_off: int = 0, tab2_off: int = 0,
                 rowdyn: bool = False, hist_gskip: bool = False,
                 ablate: tuple = ()):
    # ablate (measurement only, cfg.pallas_ablate): named pieces of the
    # visible-block update body replaced by pass-throughs so their cost
    # can be read off a live A/B — "hist" (instance-histogram update),
    # "color" (color blend), "blend" (diff/weight blend). WRONG MATH when
    # non-empty; never set in production configs.
    # merge_mid (frame_vmem only): blocks whose footprint exceeds the
    # pass-A rect but fits (mid_h, mid_w) carry vis code 3 with MID
    # origins in the same table slots, and fuse here through a
    # (mid_h, mid_w) window read from the VMEM-resident table — the
    # separate compacted mid pass (its nonzero + state gather/scatter +
    # grid fixed cost) disappears. Bit-exact: same update body, same
    # coverage contract (the dispatch test mirrors pass M's rect_fit).
    # compact: the grid is a compacted list of non-identity block RUNS
    # (cfg.pallas_compact): grid step s processes the `group` consecutive
    # blocks of run origins_ref[ids_off + s]; the state BlockSpecs'
    # index_map reads the same SMEM word, so the pipeline streams exactly
    # those runs and identity runs are never touched (aliasing keeps
    # their bytes). Block ids here are TRUE ids (coords stays "arith",
    # the dense [NB*3] origins table is indexed directly).
    # frame_vmem: the whole banded packed table lives in VMEM (the rect12
    # scratch slot holds it; ONE table DMA at grid step 0) and each
    # visible block reads its [2*rect_h, rect_w] window as a
    # dynamic-offset vector load — no per-block rect DMA at all. Measured
    # motivation: the per-block strided-row DMAs cost ~15 ns/row
    # (~11.6 ms/frame at 512^3) while tile-aligned dynamic VMEM reads
    # cost the same as static reads (PERFORMANCE.md round 4).
    # hist_hbm: the histogram (the bulk of state bytes — 64-128 B/voxel
    # vs 12 for diff+color+wt) stays in HBM (pl.ANY, aliased in place)
    # and moves by manual DMA: read only for VISIBLE blocks, written only
    # for blocks with gated (near-surface) voxels. BlockSpec streaming
    # would round-trip every block's histogram every frame — at 512^3
    # that alone is ~17 GB/frame of traffic.
    # state_hbm: the same scheme for diff/colorpk/weight — with the XLA
    # pre-classification most blocks are identity, yet BlockSpec streaming
    # still round-trips their 24 KB each (3.2 GB/frame at 512^3, ~5 ms of
    # the measured 13 ms zero-visible floor). HBM-resident + aliased,
    # DMA'd by true id only for non-identity blocks: free blocks move
    # diff+weight, full-lookup blocks all three; identity blocks move
    # nothing. (An XLA-side gather/scatter compaction was tried first and
    # LOST: 6 x 16k 8 KB-row gathers/scatters are latency-bound at
    # ~0.1 us/row — 16 ms of pure XLA prep.)
    # origins encoding: pass A (coords == "arith") packs (v0, u0, vis)
    # into ONE i32 per block — code bits 0-1, v0/8 bits 2-13, u0/128
    # bits 14-19 (see _block_origins; SMEM is a hard 1 MB) — and derives
    # the block's (bx, by, bz) arithmetically from its position; pass B
    # (full-image rect over a COMPACTED near-block subset) keeps the
    # unpacked 6-stride (v0, u0, vis, bx, by, bz) because a compacted
    # index says nothing about the coordinates
    # visit_compact (dense streamed grid only): the scalar-prefetch
    # operand additionally carries per-group non-identity lane COUNTS
    # (at cnt_off) and front-packed lane LISTS (at lanes_off, `group`
    # 16-bit slots per grid step, two per i32 word — SMEM is a hard
    # 1 MB and the dense origins table alone is 768 KB at 512^3). Each grid step first passes the whole
    # group's state through with three vector copies (the identity for
    # every block — ~6 cycles/block on the VPU), then fori-loops over
    # ONLY the listed non-identity lanes. The dense grid's per-block
    # SMEM-read+branch visits (~100 ns each, 82% of them identity at the
    # 512^3 bench scene — the measured ~13 ms zero-visible floor,
    # PERFORMANCE.md round 3b) collapse to the non-identity count.
    # Bit-exact: visited lanes run the identical update bodies and
    # overwrite their lane of the bulk copy.
    # pair (frame_vmem + hist_hbm only): ONE dense pass fuses TWO frames.
    # Frame 2's packed origins sit at origins_ref[orig2_off + blk], its
    # camera params at params_ref[32..], its banded table at rect12 rows
    # [tab2_off, 2*tab2_off). Per block, frame 1's update runs first
    # (reading the streamed input block, committing to the output block),
    # then frame 2's runs reading the OUTPUT block — per-voxel
    # composition is exactly the sequential two-kernel execution, so the
    # result is bit-identical to two single-frame launches with the same
    # relabeled masks (tests/test_fuse_pair.py). The histogram DMAs once
    # per pair: prefetched when EITHER frame is visible, updated in the
    # staging slot by each frame, written back once after both.
    def _origin(blk):
        """(a0, b0, code) of a block from the prefetch table."""
        if coords == "arith":
            w = origins_ref[blk]
            return (((w >> 2) & 0xFFF) * 8, ((w >> 14) & 0x3F) * 128,
                    w & 3)
        return (origins_ref[blk * 6], origins_ref[blk * 6 + 1],
                origins_ref[blk * 6 + 2])

    def _origin2(blk):
        """Frame 2's (a0, b0, code) (pair mode, always packed)."""
        w = origins_ref[orig2_off + blk]
        return (((w >> 2) & 0xFFF) * 8, ((w >> 14) & 0x3F) * 128, w & 3)

    def _vc_lane(stepi, j):
        # lane j of grid step stepi from the packed 16-bit lane list
        # (group is even in visit_compact mode, so a step's slots start
        # word-aligned)
        w = origins_ref[lanes_off + stepi * (group // 2) + j // 2]
        return jax.lax.shift_right_logical(
            w, jax.lax.rem(j, 2) * 16) & 0xFFFF

    """See module docstring. Mosaic layout rules shape this code: lane
    dimensions must be multiples of 128, and (16,128)->(2048,1) casts are
    unsupported — so all per-voxel scalars are computed in a (2048, 1)
    column layout (iota/compare/mul are cheap there) and reshaped to the
    (16, 128) tile layout only at the state-update boundary, which IS a
    supported cast direction."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    slot = jax.lax.rem(step, NSLOT)

    def _cam_params(p_off: int):
        """Per-frame packed camera scalars (frame 2 of a pair at +32)."""
        ax = [params_ref[p_off + i] for i in range(3)]   # E[:,0] * voxel.x
        ay = [params_ref[p_off + 3 + i] for i in range(3)]
        az = [params_ref[p_off + 6 + i] for i in range(3)]
        b0 = [params_ref[p_off + 9 + i] for i in range(3)]
        fxy = (params_ref[p_off + 12], params_ref[p_off + 13],
               params_ref[p_off + 14], params_ref[p_off + 15])
        return ax, ay, az, b0, fxy, params_ref[p_off + 16]

    ax, ay, az, b0, (fx, fy, cx, cy), mu = _cam_params(0)

    # Both per-group loops are lax.fori_loop with dynamic ref indexing,
    # NOT python unrolls: a 16x unrolled body produced ~1 MB of MLIR and
    # 700+ s Mosaic compiles at 256^3. Rect/hist DMAs are DOUBLE-BUFFERED
    # one full grid step ahead (scratch slot = step % 2): a compacted
    # sparse pass packs DMA-heavy blocks back to back, and with only
    # intra-step lookahead the kernel measured DMA-bound (the dense
    # grid's identity blocks were accidental overlap slack). Issuing
    # group g+1's copies before computing group g gives every copy a
    # whole group's compute to land in.
    def _hist_id(blk):
        # the hist HBM array is indexed by TRUE block id: equal to the
        # grid position in the dense pass, but read from the prefetched
        # (bx, by, bz) in a compacted pass (coords == "smem")
        if coords == "arith":
            return blk
        return ((origins_ref[blk * 6 + 3] * nby
                 + origins_ref[blk * 6 + 4]) * nbz
                + origins_ref[blk * 6 + 5])

    def _drain_writes(gslot, g, kinds):
        """Wait any deferred write-back still in flight on (gslot, g)
        for the given kinds (0 diff / 1 colorpk / 2 weight / 3 hist) and
        clear its flag. The wait descriptor's HBM index doesn't matter —
        DMA semaphores count bytes and every block's tile has the same
        shape — so index 0 stands in for the old block's id."""
        for k in kinds:
            idx = (k * NSLOT + gslot) * group + g

            @pl.when(wfl[idx] == 1)
            def _(k=k, idx=idx):
                if k == 0:
                    pltpu.make_async_copy(dbuf.at[gslot, g],
                                          diff_out.at[0],
                                          ssem.at[0, gslot, g]).wait()
                elif k == 1:
                    pltpu.make_async_copy(cbuf.at[gslot, g],
                                          colorpk_out.at[0],
                                          ssem.at[1, gslot, g]).wait()
                elif k == 2:
                    pltpu.make_async_copy(wbuf.at[gslot, g],
                                          wt_out.at[0],
                                          ssem.at[2, gslot, g]).wait()
                else:
                    pltpu.make_async_copy(hist_buf.at[gslot, g],
                                          hist_out.at[0],
                                          hsem.at[gslot, g]).wait()
                wfl[idx] = 0

    def _issue_one(blk, g, gslot):
        """Start the DMAs block `blk` will need (into slot gslot, lane g).
        With defer_wb, first drain any deferred write-back still using a
        buffer/semaphore this block's reads are about to reuse."""
        v0u, u0u, code = _origin(blk)
        if pair:
            # pair mode (frame_vmem + hist_hbm): the only per-block DMA
            # is the hist prefetch — started once when EITHER frame is
            # visible; both frames update the staging slot in place
            _, _, code2 = _origin2(blk)

            @pl.when((code == 1) | (code == 3)
                     | (code2 == 1) | (code2 == 3))
            def _():
                if defer_wb:
                    _drain_writes(gslot, g, (3,))
                pltpu.make_async_copy(hist_ref.at[blk],
                                      hist_buf.at[gslot, g],
                                      hsem.at[gslot, g]).start()
            return

        if state_hbm:
            @pl.when(code >= 1)   # free + full both need diff/weight
            def _():
                if defer_wb:
                    _drain_writes(gslot, g, (0, 2))
                hid = _hist_id(blk)
                pltpu.make_async_copy(diff_ref.at[hid],
                                      dbuf.at[gslot, g],
                                      ssem.at[0, gslot, g]).start()
                pltpu.make_async_copy(wt_ref.at[hid],
                                      wbuf.at[gslot, g],
                                      ssem.at[2, gslot, g]).start()

        @pl.when((code == 1) | (code == 3))
        def _():
            # code 3 (merged mid tier) exists only in frame_vmem mode:
            # no rect DMA below fires for it, but the hist prefetch must
            v0 = pl.multiple_of(v0u, 8)
            u0 = pl.multiple_of(u0u, 128)
            if lookup == "gather_nodma" or frame_vmem:
                pass  # no per-block rect DMAs in these modes
            elif banded:
                # ONE copy serves both tables (8-row bands interleaved):
                # banded rows [2*v0, 2*v0 + 2*rect_h) hold original rows
                # [v0, v0 + rect_h) of each table
                pltpu.make_async_copy(
                    pk1_hbm.at[pl.ds(pl.multiple_of(2 * v0, 16),
                                     2 * rect_h), pl.ds(u0, rect_w)],
                    rect12.at[gslot, g], sems.at[0, gslot, g]).start()
            else:
                pltpu.make_async_copy(
                    pk1_hbm.at[pl.ds(v0, rect_h), pl.ds(u0, rect_w)],
                    rect12.at[gslot, g, pl.ds(0, rect_h)],
                    sems.at[0, gslot, g]).start()
                pltpu.make_async_copy(
                    pk2_hbm.at[pl.ds(v0, rect_h), pl.ds(u0, rect_w)],
                    rect12.at[gslot, g, pl.ds(rect_h, rect_h)],
                    sems.at[1, gslot, g]).start()
            if state_hbm:
                if defer_wb:
                    _drain_writes(gslot, g, (1,))
                pltpu.make_async_copy(colorpk_ref.at[_hist_id(blk)],
                                      cbuf.at[gslot, g],
                                      ssem.at[1, gslot, g]).start()
            if hist_hbm:
                if defer_wb:
                    _drain_writes(gslot, g, (3,))
                pltpu.make_async_copy(hist_ref.at[_hist_id(blk)],
                                      hist_buf.at[gslot, g],
                                      hsem.at[gslot, g]).start()

    @pl.when(step == 0)
    def _():
        miss_ref[0, 0] = 0
        if defer_wb and (state_hbm or hist_hbm):
            def _z(g, _):
                for k in range(4):
                    for w in range(NSLOT):
                        wfl[(k * NSLOT + w) * group + g] = 0
                return 0

            jax.lax.fori_loop(0, group, _z, 0)
        if frame_vmem:
            # load the WHOLE banded table into VMEM once per pass
            # (~2.9 MB, a one-off ~4 us): every block's window is then a
            # dynamic-offset vector read
            cp = pltpu.make_async_copy(pk1_hbm, rect12, sems)
            cp.start()
            cp.wait()
        # prologue: the first NSLOT-1 groups' DMAs (afterwards, group
        # s+NSLOT-1's copies are issued INSIDE group s's block loop)
        if visit_compact:
            for w in range(NSLOT - 1):
                @pl.when(jnp.int32(w) < nsteps)
                def _(w=w):
                    def _pi(j, _):
                        g = _vc_lane(jnp.int32(w), j)
                        _issue_one(w * group + g, g, w)
                        return 0

                    jax.lax.fori_loop(0, origins_ref[cnt_off + w], _pi, 0)
        else:
            def _pro(g, _):
                for w in range(NSLOT - 1):
                    @pl.when(w * group + g < nsteps * group)
                    def _():
                        if compact:
                            _issue_one(origins_ref[ids_off + w] * group + g,
                                       g, w)
                        else:
                            _issue_one(w * group + g, g, w)
                return 0

            jax.lax.fori_loop(0, group, _pro, 0)

    # per-voxel coordinates in the native (16, 128) tile layout
    # (all VPU math runs here; earlier versions computed in a (2048, 1)
    # column layout, which wastes 127/128 lanes per vreg — ~40 wasted
    # vreg-ops per block dominated the kernel)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_S, TILE_L), 0)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_S, TILE_L), 1)
    vlin = s_i * TILE_L + l_i
    dxc = (vlin // (BY * BZ)).astype(jnp.float32)
    dyc = ((vlin // BZ) % BY).astype(jnp.float32)
    dzc = (vlin % BZ).astype(jnp.float32)

    rh_i = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_VOX, rect_h), 1)

    # hist update in the row-native [HR, 128] layout (HR = 2048*K/128):
    # row r holds voxels v = r*VPK + j//K (VPK = 128//K voxels per row),
    # lane j = (v % VPK)*K + k. Per-voxel scalars live in the (16, 128)
    # tile layout (v = s*128 + l); bringing them to [HR, 128] is a
    # sublane-replication matmul (each s-row appears 128/VPK... = 2048/128
    # copies interleaved) followed by Mosaic's equal-shape lane gather
    # (take_along_axis on <=128 lanes -> tpu.dynamic_gather).
    VPK = TILE_L // K                      # voxels per 128-lane hist row
    HR = BLOCK_VOX * K // TILE_L           # hist rows per block
    rows_per_s = TILE_L // VPK             # hist rows per (16,128) s-row
    r_i = jax.lax.broadcasted_iota(jnp.int32, (HR, TILE_S), 0)
    s_i2 = jax.lax.broadcasted_iota(jnp.int32, (HR, TILE_S), 1)
    rsel = (s_i2 == r_i // rows_per_s).astype(jnp.bfloat16)  # [HR, 16]
    rj = jax.lax.broadcasted_iota(jnp.int32, (HR, TILE_L), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (HR, TILE_L), 1)
    lane_src = (rj % rows_per_s) * VPK + jj // K   # l of voxel at (r, j)
    k_lane = (jj % K).astype(jnp.float32)

    def _block_body(g, _):
        if compact:
            blk = origins_ref[ids_off + step] * group + g
        else:
            blk = step * group + g
        hid = _hist_id(blk)

        # issue lane g of group step+NSLOT-1's DMAs first (merged
        # prefetch: the copies get NSLOT-1 groups of compute to land in,
        # and the per-block loop is visited once, not twice). In
        # visit_compact mode the future group's lane list differs from
        # this group's, so the issue runs in its own compacted loop
        # before the body loop instead.
        if not visit_compact:
            @pl.when(step + (NSLOT - 1) < nsteps)
            def _():
                if compact:
                    _issue_one(origins_ref[ids_off + step + (NSLOT - 1)]
                               * group + g, g,
                               jax.lax.rem(step + (NSLOT - 1), NSLOT))
                else:
                    _issue_one(blk + (NSLOT - 1) * group, g,
                               jax.lax.rem(step + (NSLOT - 1), NSLOT))

        def _run_frame(oa0u, ob0u, code_b, p_off: int,
                       t_off: int, first: bool):
            """All per-frame branches for one block: identity commit
            (frame 1 only -- the outputs already hold frame 1's result
            when frame 2 runs), free closed-form, rect/mid lookup.
            `first` selects the state source (streamed input vs the
            output block frame 1 committed); p_off/t_off select the
            frame's camera params and banded-table rows."""
            ax, ay, az, b0, (fx, fy, cx, cy), mu = _cam_params(p_off)
            # state accessors: VMEM staging slots in state_hbm mode (filled by
            # the prefetch DMAs), BlockSpec-streamed blocks otherwise. A
            # pair's SECOND frame reads the OUTPUT block — frame 1 commits
            # every code path (identity included), so the out refs hold its
            # result and the composition is the sequential two-launch one.
            def d_in():
                if state_hbm:
                    return dbuf[slot, g]
                return diff_ref[g] if first else diff_out[g]

            def c_in():
                if state_hbm:
                    return cbuf[slot, g]
                return colorpk_ref[g] if first else colorpk_out[g]

            def w_in():
                if state_hbm:
                    return wbuf[slot, g]
                return wt_ref[g] if first else wt_out[g]

            def _wait_state(with_cpk):
                # semaphores must be consumed exactly once per started DMA —
                # callers wait for everything their code class started, even
                # values a sub-branch ends up not using
                pltpu.make_async_copy(diff_ref.at[hid], dbuf.at[slot, g],
                                      ssem.at[0, slot, g]).wait()
                pltpu.make_async_copy(wt_ref.at[hid], wbuf.at[slot, g],
                                      ssem.at[2, slot, g]).wait()
                if with_cpk:
                    pltpu.make_async_copy(colorpk_ref.at[hid],
                                          cbuf.at[slot, g],
                                          ssem.at[1, slot, g]).wait()

            def commit(dv=None, cv=None, wv=None):
                """Write back updated tiles. None = unchanged: streamed mode
                passes the input through (every out block must be written);
                state_hbm mode writes NOTHING (the HBM alias keeps content).
                With defer_wb the waits move to the slot's next reuse
                (~16 blocks of compute away) — the DMA latency hides instead
                of serializing into the compute path; without it, start all
                then wait all (the copies at least overlap each other)."""
                if not state_hbm:
                    diff_out[g] = d_in() if dv is None else dv
                    colorpk_out[g] = c_in() if cv is None else cv
                    wt_out[g] = w_in() if wv is None else wv
                    return
                cps = []
                if dv is not None:
                    dbuf[slot, g] = dv
                    cps.append((0, pltpu.make_async_copy(
                        dbuf.at[slot, g], diff_out.at[hid],
                        ssem.at[0, slot, g])))
                if cv is not None:
                    cbuf[slot, g] = cv
                    cps.append((1, pltpu.make_async_copy(
                        cbuf.at[slot, g], colorpk_out.at[hid],
                        ssem.at[1, slot, g])))
                if wv is not None:
                    wbuf[slot, g] = wv
                    cps.append((2, pltpu.make_async_copy(
                        wbuf.at[slot, g], wt_out.at[hid],
                        ssem.at[2, slot, g])))
                for _k, cp in cps:
                    cp.start()
                if defer_wb:
                    for k, _cp in cps:
                        wfl[(k * NSLOT + slot) * group + g] = 1
                else:
                    for _k, cp in cps:
                        cp.wait()

            if first and not state_hbm and not visit_compact:
                @pl.when(code_b == 0)
                def _():
                    # block invisible this frame (or pre-classified behind):
                    # every voxel is invalid, the update is the identity —
                    # skip DMA/MXU entirely (in state_hbm mode the branch
                    # doesn't exist at all: the HBM alias keeps content; in
                    # visit_compact mode identity blocks are never visited —
                    # the whole-group bulk copy commits them)
                    commit()
                    if not hist_hbm:   # in-place HBM alias keeps content
                        hist_out[g] = hist_ref[g]

            @pl.when(code_b == 2)
            def _():
                # pre-classified FREE (XLA pooled-depth bounds): every voxel
                # valid with dn == 1 — closed-form update, no rect or hist
                # DMA ever started for this block
                if state_hbm:
                    _wait_state(with_cpk=False)
                wt = w_in().astype(jnp.float32)
                commit(dv=(d_in() * wt + 1.0) / (wt + 1.0), wv=w_in() + 1)
                if not hist_hbm:
                    hist_out[g] = hist_ref[g]

            def _vis(vrh: int, vrw: int, full_tiers: bool):
                # visible-block body over a (vrh, vrw) rect: pass A calls it
                # with (rect_h, rect_w) + the full tight-tier dispatch; the
                # merged mid tier (code 3) with (mid_h, mid_w)
                if coords == "arith":
                    bz = jax.lax.rem(blk, nbz)
                    by = jax.lax.rem(blk // nbz, nby)
                    bx = blk // (nbz * nby)
                else:
                    bx = origins_ref[blk * 6 + 3]
                    by = origins_ref[blk * 6 + 4]
                    bz = origins_ref[blk * 6 + 5]

                gx = (bx * BX).astype(jnp.float32) + dxc
                gy = (by * BY).astype(jnp.float32) + dyc
                gz = (bz * BZ).astype(jnp.float32) + dzc
                px = b0[0] + ax[0] * gx + ay[0] * gy + az[0] * gz
                py = b0[1] + ax[1] * gx + ay[1] * gy + az[1] * gz
                pz = b0[2] + ax[2] * gx + ay[2] * gy + az[2] * gz

                safe_z = jnp.where(jnp.abs(pz) < 1e-9, 1e-9, pz)
                u = jnp.floor((fx * px + cx * pz) / safe_z).astype(jnp.int32)
                v = jnp.floor((fy * py + cy * pz) / safe_z).astype(jnp.int32)
                in_img = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (pz > 0)

                # (a, b) = rect-relative (sublane, lane) coords: (v, u) for the
                # normal table, (u, v) for the transposed "gather_t" table
                oa0 = oa0u
                ob0 = ob0u
                if lookup == "gather_t":
                    al, bl = u - oa0, v - ob0
                else:
                    al, bl = v - oa0, u - ob0
                in_rect = (al >= 0) & (al < vrh) & (bl >= 0) & (bl < vrw)
                miss_ref[0, 0] += jnp.sum((in_img & ~in_rect).astype(jnp.int32))
                ok = in_img & in_rect

                a0a = pl.multiple_of(oa0, 8)
                b0a = pl.multiple_of(ob0, 128)
                if lookup == "gather_nodma" or frame_vmem:
                    pass  # no per-block rect DMA to wait on in these modes
                elif banded:
                    pltpu.make_async_copy(
                        pk1_hbm.at[pl.ds(pl.multiple_of(2 * a0a, 16),
                                         2 * rect_h), pl.ds(b0a, rect_w)],
                        rect12.at[slot, g], sems.at[0, slot, g]).wait()
                else:
                    pltpu.make_async_copy(pk1_hbm.at[pl.ds(a0a, rect_h),
                                                     pl.ds(b0a, rect_w)],
                                          rect12.at[slot, g, pl.ds(0, rect_h)],
                                          sems.at[0, slot, g]).wait()
                    pltpu.make_async_copy(pk2_hbm.at[pl.ds(a0a, rect_h),
                                                     pl.ds(b0a, rect_w)],
                                          rect12.at[slot, g,
                                                    pl.ds(rect_h, rect_h)],
                                          sems.at[1, slot, g]).wait()

                hdt = hist_buf.dtype if hist_hbm else hist_ref.dtype
                if hist_hbm and not pair:
                    # the DMA-in was started a grid step ahead (double-
                    # buffered prefetch); the wait is unconditional so the
                    # scratch slot can be reused even when this block skips
                    # the update. (pair mode waits ONCE per block before
                    # frame 1's branches — see _block_body.)
                    pltpu.make_async_copy(hist_ref.at[hid],
                                          hist_buf.at[slot, g],
                                          hsem.at[slot, g]).wait()
                if state_hbm:
                    _wait_state(with_cpk=True)

                # footprint bbox in rect coords (in-image voxels only) — feeds
                # both the uniform-classification window and the frame_vmem
                # narrow-chunk dispatch below
                big_i = jnp.int32(2 ** 30)
                al_min = jnp.min(jnp.where(in_img, al, big_i))
                al_max = jnp.max(jnp.where(in_img, al, -1))
                bl_min = jnp.min(jnp.where(in_img, bl, big_i))
                bl_max = jnp.max(jnp.where(in_img, bl, -1))

                def _apply_update(val1, val2):
                    """The full (non-uniform) update given the looked-up
                    packed values: TSDF blend, truncating color blend,
                    row-native histogram vote, commit. Shared by every
                    lookup tier (including the per-row dynamic-window
                    tier, which fuses its own bounds scan)."""
                    hdt = hist_buf.dtype if hist_hbm else hist_ref.dtype
                    d_raw = jnp.mod(val1, 65536.0)   # uint16 depth, exact
                    m_id = jnp.floor(val1 / 65536.0)  # mask id
                    diff_m = d_raw / depth_scale - pz
                    valid = ok & (d_raw > 0) & (diff_m > -mu)
                    dn = jnp.minimum(diff_m, mu) / mu
                    gate = valid & (dn < color_diff_gate)
                    m_clip = jnp.clip(m_id.astype(jnp.int32), 0, K - 1)

                    wt = w_in().astype(jnp.float32)
                    if "blend" in ablate:   # measurement pass-through
                        new_diff = None
                    else:
                        new_diff = jnp.where(
                            valid, (d_in() * wt + dn) / (wt + 1.0),
                            d_in())

                    # color: integer truncating blend per byte, exact f32
                    if "color" in ablate:   # measurement pass-through
                        new_cpk = None
                    else:
                        cpk = c_in()
                        cb = jnp.mod(cpk, 256.0)
                        cg = jnp.mod(jnp.floor(cpk / 256.0), 256.0)
                        cr = jnp.floor(cpk / 65536.0)
                        nb_ = jnp.mod(val2, 256.0)
                        ng = jnp.mod(jnp.floor(val2 / 256.0), 256.0)
                        nr = jnp.floor(val2 / 65536.0)
                        wtp1 = wt + 1.0

                        # floor of an f32 division can land one above
                        # the true integer quotient when the ratio sits
                        # just under an integer; correct it so the blend
                        # matches the reference's integer truncation
                        # exactly.
                        def idiv(a, den):
                            q = jnp.floor(a / den)
                            return q - (q * den > a).astype(jnp.float32)

                        ub = idiv(cb * wt + nb_, wtp1)
                        ug = idiv(cg * wt + ng, wtp1)
                        ur = idiv(cr * wt + nr, wtp1)
                        new_cpk = jnp.where(
                            gate, ub + ug * 256.0 + ur * 65536.0, cpk)

                    # histogram in the row-native layout: replicate each
                    # s-row of (m, gate) to its hist rows on the MXU
                    # (bf16-exact: values <= K-1 and 0/1, one-term
                    # sums), then lane-gather the voxel column and
                    # compare against the k lane pattern. Only blocks
                    # with at least one gated (near-surface) voxel pay.
                    any_gate = jnp.any(gate)

                    def _hist_update(h_in):
                        # ONE packed replication matmul + ONE lane
                        # gather: val = m + K*gate <= 2K-1 (63) is
                        # bf16-exact and the rsel matmul sums exactly
                        # one term, so the pack survives both hops;
                        # gated lanes decode as val - K == k. The
                        # take_along over [HR, 128] was the hist
                        # update's dominant cost (the r4 ablation put
                        # hist at ~2.7 ms/frame at 512^3) — halving
                        # the matmul+gather count halves it.
                        mg = (m_clip
                              + gate.astype(jnp.int32) * K)
                        mg2 = jnp.dot(rsel, mg.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)
                        mg_exp = jnp.take_along_axis(mg2, lane_src,
                                                     axis=1)
                        oh = mg_exp == k_lane + jnp.float32(K)
                        if hdt == jnp.uint8:
                            # u8 counts saturate instead of wrapping
                            # (exact for <= 255 fused frames — the
                            # reference caps at 100, kernel.cpp:74).
                            # Mosaic's v5e vector ALU has no i8 add and
                            # no i16 compare — compute in i32, store u8:
                            # HBM traffic still halves.
                            h32 = h_in.astype(jnp.int32)
                            oh32 = (oh & (h32 < 255)).astype(jnp.int32)
                            return (h32 + oh32).astype(hdt)
                        return h_in + oh.astype(hdt)

                    # group-skip (r5e, cfg.pallas_hist_gskip): the hist
                    # update's cost is the [HR, 128] data movement — 16x
                    # the voxel tile regardless of gate sparsity. Split
                    # the rows into 4 groups of TILE_S/4 source s-rows
                    # each and skip groups whose voxels never gate (the
                    # near-surface band usually crosses only part of a
                    # block). Bit-exact: skipped groups' rows receive no
                    # votes by definition.
                    gskip = (hist_gskip and HR % 4 == 0
                             and TILE_S % 4 == 0)
                    NRG, NSG = HR // 4, TILE_S // 4

                    def _hist_update_rows(h_in_g, gg):
                        sl_ = slice(gg * NRG, (gg + 1) * NRG)
                        mg = (m_clip + gate.astype(jnp.int32) * K)
                        mg2 = jnp.dot(rsel[sl_],
                                      mg.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)
                        mg_exp = jnp.take_along_axis(mg2, lane_src[sl_],
                                                     axis=1)
                        oh = mg_exp == k_lane[sl_] + jnp.float32(K)
                        if hdt == jnp.uint8:
                            h32 = h_in_g.astype(jnp.int32)
                            oh32 = (oh & (h32 < 255)).astype(jnp.int32)
                            return (h32 + oh32).astype(hdt)
                        return h_in_g + oh.astype(hdt)

                    if "hist" in ablate:    # measurement pass-through
                        if not hist_hbm:
                            hist_out[g] = hist_ref[g]
                    elif hist_hbm and pair and gskip:
                        for gg in range(4):
                            @pl.when(jnp.any(
                                gate[gg * NSG:(gg + 1) * NSG, :]))
                            def _(gg=gg):
                                sl_ = slice(gg * NRG, (gg + 1) * NRG)
                                hist_buf[slot, g, sl_] = _hist_update_rows(
                                    hist_buf[slot, g, sl_], gg)
                                wfl[4 * NSLOT * group + g] = 1
                    elif hist_hbm and pair:
                        # pair: both frames update the staging slot
                        # in place; ONE write-back fires after frame
                        # 2 if either frame dirtied it (_block_body)
                        @pl.when(any_gate)
                        def _():
                            hist_buf[slot, g] = _hist_update(
                                hist_buf[slot, g])
                            wfl[4 * NSLOT * group + g] = 1
                    elif hist_hbm:
                        @pl.when(any_gate)
                        def _():
                            if gskip:
                                for gg in range(4):
                                    @pl.when(jnp.any(
                                        gate[gg * NSG:(gg + 1) * NSG, :]))
                                    def _(gg=gg):
                                        sl_ = slice(gg * NRG,
                                                    (gg + 1) * NRG)
                                        hist_buf[slot, g, sl_] = \
                                            _hist_update_rows(
                                                hist_buf[slot, g, sl_],
                                                gg)
                            else:
                                hist_buf[slot, g] = _hist_update(
                                    hist_buf[slot, g])
                            cp = pltpu.make_async_copy(
                                hist_buf.at[slot, g],
                                hist_out.at[hid], hsem.at[slot, g])
                            cp.start()
                            if defer_wb:
                                wfl[(3 * NSLOT + slot) * group + g] = 1
                            else:
                                cp.wait()
                    else:
                        @pl.when(any_gate)
                        def _():
                            hist_out[g] = _hist_update(hist_ref[g])

                        @pl.when(~any_gate)
                        def _():
                            hist_out[g] = hist_ref[g]

                    commit(dv=new_diff, cv=new_cpk,
                           wv=(None if "blend" in ablate
                               else w_in() + valid.astype(jnp.int32)))

                def _update_body(winv, al_off, bl_off, wrh, wrw):
                    """Uniform classification + the three update bodies over a
                    static (wrh, wrw) window whose rows/lanes sit at offsets
                    (al_off, bl_off) within the block rect. `winv` is the
                    banded frame_vmem window VALUE; None = the DMA-scratch
                    paths (which read rect12 and use the full rect,
                    offsets == 0, wrh == rect_h).

                    ---- uniform-block classification (the 512^3 lever) ----
                    The per-voxel rect lookup is the kernel's dominant cost,
                    but MOST visible blocks don't need it: a block whose whole
                    footprint depth range puts every voxel beyond the
                    truncation band in FRONT of the surface updates uniformly
                    (dn == 1, no color/hist), and one entirely BEHIND it
                    (diff <= -mu culled) is the identity. Both bounds come
                    from a masked min/max over the footprint's bbox inside the
                    window — ~30x cheaper than the lookup chain — and are
                    conservative in exact f32 arithmetic, so the classified
                    updates are BIT-IDENTICAL to the full path:
                      free:   d_raw >= d_min, pz <= pz_max
                              => diff_m >= d_min/s - pz_max >= mu => dn = 1
                      behind: d_raw <= d_max, pz >= pz_min
                              => diff_m <= d_max/s - pz_min <= -mu => invalid
                    (d_raw == 0 pixels are invalid in both paths.) The miss
                    counter above is branch-independent. `uniform_skip` gates
                    the whole scheme for A/B timing."""
                    al_r = al - al_off
                    bl_r = bl - bl_off
                    if uniform_skip:
                        if winv is not None:
                            d_tab = winv.reshape(
                                (2 * wrh) // 16, 16, wrw)[:, :8].reshape(
                                wrh, wrw)
                            d_tab = jnp.mod(d_tab, 65536.0)
                        elif banded:
                            # depth rows are the even 8-row bands, in original
                            # row order once de-interleaved
                            d_tab = rect12[slot, g].reshape(
                                (2 * wrh) // 16, 16, wrw)[:, :8].reshape(
                                wrh, wrw)
                            d_tab = jnp.mod(d_tab, 65536.0)
                        else:
                            d_tab = jnp.mod(rect12[slot, g, :wrh], 65536.0)
                        row_i = jax.lax.broadcasted_iota(jnp.int32,
                                                         (wrh, wrw), 0)
                        col_i = jax.lax.broadcasted_iota(jnp.int32,
                                                         (wrh, wrw), 1)
                        fp = ((row_i >= al_min - al_off)
                              & (row_i <= al_max - al_off)
                              & (col_i >= bl_min - bl_off)
                              & (col_i <= bl_max - bl_off))
                        d_min = jnp.min(jnp.where(fp, d_tab, jnp.float32(1e30)))
                        d_max = jnp.max(jnp.where(fp, d_tab, 0.0))
                        pz_min = jnp.min(pz)
                        pz_max = jnp.max(pz)
                        behind = d_max / depth_scale - pz_min <= -mu
                        free = (jnp.all(ok) & (d_min > 0.0)
                                & (d_min / depth_scale - pz_max >= mu))
                    else:
                        behind = jnp.bool_(False)
                        free = jnp.bool_(False)

                    @pl.when(behind)
                    def _():
                        # every voxel invalid: full identity
                        commit()
                        if not hist_hbm:
                            hist_out[g] = hist_ref[g]

                    @pl.when(~behind & free)
                    def _():
                        # every voxel valid with dn == 1: closed-form update,
                        # color/hist gated off (dn >= color_diff_gate)
                        wt = w_in().astype(jnp.float32)
                        commit(dv=(d_in() * wt + 1.0) / (wt + 1.0),
                               wv=w_in() + 1)
                        if not hist_hbm:
                            hist_out[g] = hist_ref[g]

                    @pl.when(~behind & ~free)
                    def _():
                        if winv is not None:
                            val1, val2 = _rect_lookup_gather_banded(
                                winv, al_r, bl_r, ok, wrh, wrw)
                        elif banded:
                            val1, val2 = _rect_lookup_gather_banded(
                                rect12.at[slot, g], al, bl, ok, wrh, wrw)
                        elif lookup in ("gather", "gather_t", "gather_nodma"):
                            val1, val2 = _rect_lookup_gather(
                                rect12.at[slot, g], al, bl, ok, wrh, wrw)
                        elif lookup == "none":  # ablation only (WRONG math)
                            val1 = (jnp.zeros((TILE_S, TILE_L), jnp.float32)
                                    + rect12[slot, g, 0, 0])
                            val2 = (jnp.zeros((TILE_S, TILE_L), jnp.float32)
                                    + rect12[slot, g, rect_h, 0])
                        else:
                            val1, val2 = _rect_lookup_matmul(
                                rect12[slot, g, :rect_h],
                                rect12[slot, g, rect_h:],
                                al, bl, ok, rh_i, rect_h, wrw)
                        _apply_update(val1, val2)

                if frame_vmem:
                    # Tight-window specialization: the window read, the
                    # uniform-bound scan and the whole gather chain scale with
                    # the static window size, and most footprints are FAR
                    # smaller than the rect (measured at the 512^3 bench
                    # scene: v-extent p50 = 22 rows, 79% fit a 32-row
                    # 8-anchored window; 82% fit one 128-lane chunk). The
                    # window anchors to the FOOTPRINT (8/128-aligned floor of
                    # its absolute min, clamped to the table), not the rect:
                    #   tier 0 (16, 128): footprint fits the smallest spans
                    #                     (full_tiers passes only);
                    #   tier 1 (32, 128): footprint fits both tight spans;
                    #   tier 2 (vrh, 128): lanes fit one chunk only;
                    #   tier 3 (vrh, vrw): the always-correct fallback.
                    # Bit-exact: each tier's window covers the whole in-image
                    # footprint bbox by its dispatch test, so the uniform
                    # bounds see the same pixel set and ok-masking zeroes
                    # everything else — dispatch changes cost, never values.
                    # logical (un-banded) per-frame table height: a
                    # pair scratch stacks two banded tables
                    tab_h = (tab2_off if pair else rect12.shape[0]) // 2
                    tab_w = rect12.shape[1]
                    v0b = pl.multiple_of(t_off + 2 * a0a, 16)
                    av_max = oa0 + al_max
                    au_max = ob0 + bl_max
                    nonempty = al_max >= al_min
                    RW0, RW1 = 16, 32
                    ca = jnp.clip(((ob0 + bl_min) // TILE_L) * TILE_L,
                                  0, tab_w - TILE_L)
                    one_ch = nonempty & (au_max - ca < TILE_L)
                    if full_tiers and vrw > TILE_L and vrh > RW1:
                        va0 = jnp.clip(((oa0 + al_min) // 8) * 8,
                                       0, tab_h - RW0)
                        va = jnp.clip(((oa0 + al_min) // 8) * 8,
                                      0, tab_h - RW1)
                        t0 = one_ch & (av_max - va0 < RW0)

                        # ---- per-ROW dynamic-window tier (r5, rowdyn):
                        # the gather chain's cost scales with the STATIC
                        # window row count x 16 sublane invocations; but
                        # each sublane row's ok-voxels span only a few
                        # table rows. Give every s-row its OWN 16-logical-
                        # row banded window at a dynamic 8-aligned offset
                        # (Mosaic dynamic vector reads cost the same as
                        # static — PERFORMANCE.md r4 frame_vmem) so the
                        # per-row gather processes 32 banded rows
                        # regardless of the block's total v-extent.
                        # Dispatched when every s-row's ok-footprint fits
                        # its aligned window; runs the full update (no
                        # uniform shortcut — XLA preclass already removed
                        # most uniform blocks). Bit-exact: same ok set,
                        # same table values, same update math.
                        if rowdyn:
                            RDH = 16
                            avr = oa0 + al
                            rd_fit = jnp.bool_(True)
                            v0s = []
                            for s in range(TILE_S):
                                rmin = jnp.min(jnp.where(
                                    ok[s:s + 1, :], avr[s:s + 1, :],
                                    big_i))
                                rmax = jnp.max(jnp.where(
                                    ok[s:s + 1, :], avr[s:s + 1, :], -1))
                                v0 = jnp.clip((rmin // 8) * 8, 0,
                                              tab_h - RDH)
                                # ok-empty rows pass vacuously (rmax=-1)
                                rd_fit = rd_fit & (rmax - v0 < RDH)
                                v0s.append(v0)
                            rd = one_ch & ~t0 & rd_fit

                            @pl.when(rd)
                            def _():
                                H2 = 2 * RDH
                                vio = jax.lax.broadcasted_iota(
                                    jnp.int32, (H2, TILE_L), 0)
                                ub = ob0 + bl
                                cac = pl.multiple_of(ca, 128)
                                rows1, rows2 = [], []
                                for s in range(TILE_S):
                                    win = rect12[
                                        pl.ds(pl.multiple_of(
                                            t_off + 2 * v0s[s], 16), H2),
                                        pl.ds(cac, TILE_L)]
                                    vrel = jnp.broadcast_to(
                                        avr[s:s + 1, :] - v0s[s],
                                        (H2, TILE_L))
                                    okr = jnp.broadcast_to(
                                        ok[s:s + 1, :], (H2, TILE_L))
                                    vb = vrel + ((vrel >> 3) << 3)
                                    vmask = (((vio == vb)
                                              | (vio == vb + 8))
                                             & okr).astype(jnp.float32)
                                    idx = jnp.clip(jnp.broadcast_to(
                                        ub[s:s + 1, :] - ca,
                                        (H2, TILE_L)), 0, TILE_L - 1)
                                    g12 = jnp.take_along_axis(win, idx,
                                                              axis=1)
                                    prod = (g12 * vmask).reshape(
                                        2, 16, TILE_L)
                                    rows1.append(jnp.sum(
                                        prod[:, :8], axis=(0, 1)
                                    ).reshape(1, TILE_L))
                                    rows2.append(jnp.sum(
                                        prod[:, 8:], axis=(0, 1)
                                    ).reshape(1, TILE_L))
                                _apply_update(
                                    jnp.concatenate(rows1, axis=0),
                                    jnp.concatenate(rows2, axis=0))
                        else:
                            rd = jnp.bool_(False)

                        t1 = one_ch & ~t0 & ~rd & (av_max - va < RW1)
                        t2 = one_ch & ~t0 & ~rd & ~t1

                        @pl.when(t0)
                        def _():
                            winv = rect12[
                                pl.ds(pl.multiple_of(t_off + 2 * va0,
                                                     16), 2 * RW0),
                                pl.ds(pl.multiple_of(ca, 128), TILE_L)]
                            _update_body(winv, va0 - oa0, ca - ob0,
                                         RW0, TILE_L)

                        @pl.when(t1)
                        def _():
                            winv = rect12[
                                pl.ds(pl.multiple_of(t_off + 2 * va,
                                                     16), 2 * RW1),
                                pl.ds(pl.multiple_of(ca, 128), TILE_L)]
                            _update_body(winv, va - oa0, ca - ob0,
                                         RW1, TILE_L)

                        @pl.when(t2)
                        def _():
                            winv = rect12[
                                pl.ds(v0b, 2 * vrh),
                                pl.ds(pl.multiple_of(ca, 128), TILE_L)]
                            _update_body(winv, jnp.int32(0), ca - ob0,
                                         vrh, TILE_L)

                        @pl.when(~one_ch)
                        def _():
                            winv = rect12[pl.ds(v0b, 2 * vrh),
                                          pl.ds(b0a, vrw)]
                            _update_body(winv, jnp.int32(0), jnp.int32(0),
                                         vrh, vrw)
                    elif vrw > TILE_L:
                        # merged mid tier: one-chunk / full-window dispatch
                        @pl.when(one_ch)
                        def _():
                            winv = rect12[
                                pl.ds(v0b, 2 * vrh),
                                pl.ds(pl.multiple_of(ca, 128), TILE_L)]
                            _update_body(winv, jnp.int32(0), ca - ob0,
                                         vrh, TILE_L)

                        @pl.when(~one_ch)
                        def _():
                            winv = rect12[pl.ds(v0b, 2 * vrh),
                                          pl.ds(b0a, vrw)]
                            _update_body(winv, jnp.int32(0), jnp.int32(0),
                                         vrh, vrw)
                    else:
                        winv = rect12[pl.ds(v0b, 2 * vrh),
                                      pl.ds(b0a, vrw)]
                        _update_body(winv, jnp.int32(0), jnp.int32(0),
                                     vrh, vrw)
                else:
                    _update_body(None, jnp.int32(0), jnp.int32(0),
                                 vrh, vrw)

            @pl.when(code_b == 1)
            def _():
                _vis(rect_h, rect_w, True)

            if merge_mid:
                @pl.when(code_b == 3)
                def _():
                    _vis(mid_h, mid_w, False)

        oa0u, ob0u, code_b = _origin(blk)
        if pair:
            # reset the pair hist-dirty flag and consume the (single)
            # hist prefetch for blocks visible in either frame
            wfl[4 * NSLOT * group + g] = 0
            _, _, c2w = _origin2(blk)

            @pl.when((code_b == 1) | (code_b == 3)
                     | (c2w == 1) | (c2w == 3))
            def _():
                pltpu.make_async_copy(hist_ref.at[blk],
                                      hist_buf.at[slot, g],
                                      hsem.at[slot, g]).wait()

        _run_frame(oa0u, ob0u, code_b, 0, 0, True)
        if pair:
            oa2, ob2, c2 = _origin2(blk)
            _run_frame(oa2, ob2, c2, 32, tab2_off, False)

            # one hist write-back per pair, if either frame updated it
            @pl.when(wfl[4 * NSLOT * group + g] == 1)
            def _():
                cp = pltpu.make_async_copy(hist_buf.at[slot, g],
                                           hist_out.at[blk],
                                           hsem.at[slot, g])
                cp.start()
                if defer_wb:
                    wfl[(3 * NSLOT + slot) * group + g] = 1
                else:
                    cp.wait()
        return 0

    if visit_compact:
        # whole-group identity pass-through: three vector copies commit
        # every block's state unchanged; the compacted lane loop below
        # overwrites the non-identity lanes with their real updates.
        # (hist is HBM-aliased in this mode — identity blocks never
        # touch it.)
        diff_out[...] = diff_ref[...]
        colorpk_out[...] = colorpk_ref[...]
        wt_out[...] = wt_ref[...]

        # issue group step+NSLOT-1's DMAs over ITS lane list (strictly
        # before this group's compute — a full group of landing slack)
        @pl.when(step + (NSLOT - 1) < nsteps)
        def _():
            fstep = step + (NSLOT - 1)
            fslot = jax.lax.rem(fstep, NSLOT)

            def _fi(j, _):
                g = _vc_lane(fstep, j)
                _issue_one(fstep * group + g, g, fslot)
                return 0

            jax.lax.fori_loop(0, origins_ref[cnt_off + fstep], _fi, 0)

        def _block_body_vc(j, carry):
            return _block_body(_vc_lane(step, j), carry)

        jax.lax.fori_loop(0, origins_ref[cnt_off + step], _block_body_vc, 0)
    else:
        jax.lax.fori_loop(0, group, _block_body, 0)

    if defer_wb and (state_hbm or hist_hbm):
        # final-step drain: the last NSLOT steps' deferred write-backs
        # have no subsequent slot reuse to wait them — drain every
        # outstanding flag before the kernel ends
        @pl.when(step == nsteps - 1)
        def _():
            def _fin(g, _):
                for w in range(NSLOT):
                    if state_hbm:
                        _drain_writes(w, g, (0, 1, 2))
                    if hist_hbm:
                        _drain_writes(w, g, (3,))
                return 0

            jax.lax.fori_loop(0, group, _fin, 0)


def _compacted_pass(state_arrays, flags, origs, rect, budget, grp, *,
                    b, cfg, K, H, W, pk1, pk2, params, lookup,
                    defer_wb, uniform_skip, mid_h, mid_w, interpret,
                    codes=None, hist_hbm=False, st_hbm=False,
                    fv=False, band=False, merge=False):
    """Fuse the `flags` blocks (up to `budget`) with a `rect`-sized
    window at per-slot origins. Returns (updated arrays, misses,
    whole-block overflow count).

    `codes` (optional [NB] i32) carries each block's vis code into the
    slot table so the kernel's free closed-form branch (code 2) works
    inside a compacted pass. `hist_hbm`/`st_hbm` keep the FULL
    histogram / diff/colorpk/weight in HBM (aliased in place, manual
    DMA by true block id) instead of gathering + streaming per-slot
    blocks: an XLA-side gather/scatter of 16k state blocks measured
    16 ms of pure prep (8 KB-row gathers are latency-bound at
    ~0.1 us/row) — the sparse main pass uses both."""
    NB = b.diff.shape[0]
    HRK2 = BLOCK_VOX * K // TILE_L
    new_diff, new_cpk, new_wt, new_hist = state_arrays
    rh, rw = rect
    n_flag = flags.sum()
    (ids,) = jnp.nonzero(flags, size=budget, fill_value=NB)
    valid = (ids < NB).astype(jnp.int32)
    idc = jnp.minimum(ids, NB - 1)
    bx = (idc // (b.nbz * b.nby)).astype(jnp.int32)
    by = ((idc // b.nbz) % b.nby).astype(jnp.int32)
    bz = (idc % b.nbz).astype(jnp.int32)
    if origs is None:
        a0 = jnp.zeros_like(idc)
        b0 = jnp.zeros_like(idc)
    else:
        o2 = origs.reshape(NB, 2)
        a0, b0 = o2[idc, 0], o2[idc, 1]
    vis_col = valid if codes is None else valid * codes[idc]
    origins_c = jnp.stack([a0, b0, vis_col, bx, by, bz],
                          axis=-1).reshape(-1)
    kern_c = partial(_fuse_kernel, K=K, H=H, W=W, nby=b.nby,
                     nbz=b.nbz, rect_h=rh, rect_w=rw,
                     color_diff_gate=cfg.color_diff_gate,
                     depth_scale=cfg.depth_scale, group=grp,
                     coords="smem", lookup=lookup, hist_hbm=hist_hbm,
                     banded=band, frame_vmem=fv, state_hbm=st_hbm,
                     defer_wb=defer_wb,
                     ablate=tuple(getattr(cfg, "pallas_ablate", ())),
                     uniform_skip=uniform_skip,
                     merge_mid=merge, mid_h=mid_h, mid_w=mid_w)
    hist_spec = (pl.BlockSpec(memory_space=pl.ANY) if hist_hbm
                 else pl.BlockSpec((grp, HRK2, TILE_L),
                                   lambda i, o: (i, 0, 0),
                                   memory_space=pltpu.VMEM))
    if st_hbm:
        state_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    else:
        sspec = pl.BlockSpec((grp, TILE_S, TILE_L),
                             lambda i, o: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        state_specs = [sspec, sspec, sspec]
    grid_c = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(budget // grp,),
        in_specs=[
            pl.BlockSpec((32,), lambda i, o: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            *state_specs,
            hist_spec,
        ],
        out_specs=[
            *state_specs,
            hist_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            # DMA pipeline slots, as in the dense grid spec — or the
            # VMEM-resident table in frame_vmem mode
            (pltpu.VMEM(pk1.shape, jnp.float32) if fv
             else pltpu.VMEM((NSLOT, grp, 2 * rh, rw), jnp.float32)),
            (pltpu.SemaphoreType.DMA if fv
             else pltpu.SemaphoreType.DMA((2, NSLOT, grp))),
            # hist staging slots (hbm mode); positionally required
            pltpu.VMEM((NSLOT, grp, HRK2, TILE_L), b.hist.dtype),
            pltpu.SemaphoreType.DMA((NSLOT, grp)),
            # state staging slots (state_hbm mode)
            pltpu.VMEM((NSLOT, grp, TILE_S, TILE_L), jnp.float32),
            pltpu.VMEM((NSLOT, grp, TILE_S, TILE_L), jnp.float32),
            pltpu.VMEM((NSLOT, grp, TILE_S, TILE_L), jnp.int32),
            pltpu.SemaphoreType.DMA((3, NSLOT, grp)),
            pltpu.SMEM((4 * NSLOT * grp,), jnp.int32),
        ],
    )
    da = new_diff if st_hbm else new_diff[idc]
    ca = new_cpk if st_hbm else new_cpk[idc]
    wa = new_wt if st_hbm else new_wt[idc]
    ha = new_hist if hist_hbm else new_hist[idc]
    d2, c2, w2, h2, miss_c = pl.pallas_call(
        kern_c,
        grid_spec=grid_c,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct(da.shape, jnp.float32),
            jax.ShapeDtypeStruct(ca.shape, jnp.float32),
            jax.ShapeDtypeStruct(wa.shape, jnp.int32),
            jax.ShapeDtypeStruct(ha.shape, ha.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )(origins_c, params, pk1, pk2, da, ca, wa, ha)
    # out-of-bounds indices (padded slots carry ids == NB) are dropped
    return ((d2 if st_hbm else new_diff.at[ids].set(d2),
             c2 if st_hbm else new_cpk.at[ids].set(c2),
             w2 if st_hbm else new_wt.at[ids].set(w2),
             h2 if hist_hbm else new_hist.at[ids].set(h2)),
            miss_c[0, 0], jnp.maximum(n_flag - budget, 0))


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def fuse_frame_blocked(b: BlockedTSDFState, depth: jax.Array,
                       color: jax.Array, mask: jax.Array,
                       extrinsic2init: jax.Array, intrinsic: jax.Array,
                       cfg: FusionConfig):
    """Pallas fusion step on a blocked state. Returns (new_state, misses)."""
    return fuse_frame_blocked_impl(b, depth, color, mask, extrinsic2init,
                                   intrinsic, cfg)


def fuse_frame_blocked_impl(b: BlockedTSDFState, depth: jax.Array,
                            color: jax.Array, mask: jax.Array,
                            extrinsic2init: jax.Array, intrinsic: jax.Array,
                            cfg: FusionConfig):
    """Unjitted body of fuse_frame_blocked — also callable per-shard inside
    shard_map (parallel/sharding.py fuses a volume-sharded state by giving
    each shard a local BlockedTSDFState with a shifted vol_start)."""
    H, W = depth.shape
    K = b.hist.shape[1] * TILE_L // BLOCK_VOX
    NB = b.diff.shape[0]
    assert NB % GROUP == 0

    lookup = getattr(cfg, "pallas_lookup", "gather_t")
    rect_mid = getattr(cfg, "pallas_rect_mid", (192, 384))
    preclass = getattr(cfg, "pallas_preclass", True)
    cls_kw = (dict(depth=depth, depth_scale=cfg.depth_scale, mu=b.mu)
              if preclass else {})
    pk1, pk2 = _pack_frame(depth, color, mask)
    banded = (lookup == "gather"
              and getattr(cfg, "pallas_banded_rect", False))
    frame_vmem = (lookup == "gather" and not banded
                  and getattr(cfg, "pallas_frame_vmem", True))
    if lookup == "gather_t":
        # transposed tables [W', H']: the 8-slack sublane alignment lands
        # on u and the rect shrinks (see _block_origins / FusionConfig)
        rect_h, rect_w = getattr(cfg, "pallas_rect_t", (64, 256))
        Hp = max((W + 7) // 8 * 8, rect_h)       # sublane dim = u
        Wp = max((H + 127) // 128 * 128, rect_w)  # lane dim = v
        pk1 = jnp.pad(pk1.T, ((0, Hp - W), (0, Wp - H)))
        pk2 = jnp.pad(pk2.T, ((0, Hp - W), (0, Wp - H)))
        origins, flag_mid, flag_full, origins_mid = _block_origins(
            b, extrinsic2init, intrinsic, Hp, Wp, rect_h, rect_w,
            img_h=H, img_w=W, transposed=True, rect_mid=rect_mid,
            **cls_kw)
    else:
        rect_h, rect_w = getattr(cfg, "pallas_rect", (RECT_H, RECT_W))
        # pad the packed tables so a clamped rect DMA is always in bounds
        Hp, Wp = max(H, rect_h), max(W, rect_w)
        if frame_vmem:
            # size gate: the VMEM-resident table must leave room for the
            # hist/state scratch (~12 MB of a 100 MB budget is generous)
            fhg = max((Hp + 7) // 8 * 8, rect_mid[0])
            fwg = max((Wp + 127) // 128 * 128, rect_mid[1])
            if 2 * fhg * fwg * 4 > 12 * 1024 * 1024:
                frame_vmem = False
        if (Hp, Wp) != (H, W):
            pk1 = jnp.pad(pk1, ((0, Hp - H), (0, Wp - W)))
            pk2 = jnp.pad(pk2, ((0, Hp - H), (0, Wp - W)))
        origins, flag_mid, flag_full, origins_mid = _block_origins(
            b, extrinsic2init, intrinsic, Hp, Wp, rect_h, rect_w,
            rect_mid=rect_mid, merge_mid=frame_vmem, **cls_kw)

    E = extrinsic2init.astype(jnp.float32)
    Km = intrinsic.astype(jnp.float32)
    vs = b.vol_start
    base = E[:3, :3] @ vs + E[:3, 3]
    params = jnp.concatenate([
        E[:3, 0] * b.voxel[0], E[:3, 1] * b.voxel[1], E[:3, 2] * b.voxel[2],
        base,
        jnp.stack([Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2]]),
        b.mu[None],
        jnp.zeros((15,), jnp.float32),
    ]).astype(jnp.float32)

    HRK = BLOCK_VOX * K // TILE_L
    uniform_skip = getattr(cfg, "pallas_uniform_skip", True)
    interpret = jax.default_backend() == "cpu"
    sparse = getattr(cfg, "pallas_sparse", False)
    state_hbm = cfg.pallas_state_hbm and not sparse
    defer_wb = getattr(cfg, "pallas_defer_writeback", True)
    merge_mid = frame_vmem  # mid tier fused into pass A (code 3)
    mid_h, mid_w = rect_mid
    if banded or frame_vmem:
        # pad to the largest window any pass needs, then interleave the
        # two packed tables in 8-row bands ONCE — every pass's rect DMA
        # becomes a single copy (banded mode), or the whole table loads
        # into VMEM once per pass and blocks read dynamic-offset windows
        # (frame_vmem mode; see FusionConfig.pallas_frame_vmem)
        fh = max((Hp + 7) // 8 * 8, rect_mid[0])
        fw = max((Wp + 127) // 128 * 128, rect_mid[1])
        if (fh, fw) != (Hp, Wp):
            pk1 = jnp.pad(pk1, ((0, fh - Hp), (0, fw - Wp)))
            pk2 = jnp.pad(pk2, ((0, fh - Hp), (0, fw - Wp)))
            Hp, Wp = fh, fw
        pk12 = jnp.stack([pk1.reshape(Hp // 8, 8, Wp),
                          pk2.reshape(Hp // 8, 8, Wp)],
                         axis=1).reshape(2 * Hp, Wp)
        pk1 = pk2 = pk12

    compact = getattr(cfg, "pallas_compact", False) and not sparse
    if compact:
        # ---- compacted streamed main grid (see FusionConfig.pallas_compact)
        # One grid step per non-identity RUN of CG consecutive blocks; the
        # run-id list rides the scalar prefetch operand (appended after
        # the dense origins table) and drives BOTH the kernel's block ids
        # and the state BlockSpecs' index_map — the pipeline streams only
        # listed runs; identity runs keep their bytes via aliasing. NO
        # XLA gather/scatter and NO manual state DMA anywhere.
        CG = int(getattr(cfg, "pallas_compact_grp", 8))
        assert NB % CG == 0, f"NB {NB} not divisible by compact grp {CG}"
        NBR = NB // CG
        flags_b = (origins & 3) > 0
        flags_r = flags_b.reshape(NBR, CG).any(axis=1)
        n_runs = flags_r.sum()
        BV = min(getattr(cfg, "vis_block_budget", 16384), NB)
        BR = max(min(BV // CG, NBR), 1)
        (rids,) = jnp.nonzero(flags_r, size=BR, fill_value=NBR)
        # padding steps point at an all-identity run: its code-0 slots
        # commit the identity (out = streamed input), and it is never a
        # real step's target — exact under both the compiled pipeline's
        # same-index copy elision and interpret mode. argmin(flags) finds
        # one whenever padding exists (n_runs < BR <= NBR).
        pid = jnp.argmin(flags_r.astype(jnp.int32)).astype(jnp.int32)
        rids_p = jnp.where(rids < NBR, rids, pid).astype(jnp.int32)
        sp_c = jnp.concatenate([origins, rids_p])
        ids_off = origins.shape[0]

        kern = partial(_fuse_kernel, K=K, H=H, W=W, nby=b.nby, nbz=b.nbz,
                       rect_h=rect_h, rect_w=rect_w,
                       color_diff_gate=cfg.color_diff_gate,
                       depth_scale=cfg.depth_scale, group=CG,
                       lookup=lookup, hist_hbm=True, banded=banded,
                       frame_vmem=frame_vmem, defer_wb=defer_wb,
                       state_hbm=False, uniform_skip=uniform_skip,
                       ablate=tuple(getattr(cfg, "pallas_ablate", ())),
                       compact=True, ids_off=ids_off,
                       rowdyn=getattr(cfg, "pallas_rowdyn", False),
                       hist_gskip=getattr(cfg, "pallas_hist_gskip", False),
                       merge_mid=merge_mid, mid_h=mid_h, mid_w=mid_w)
        sspec = pl.BlockSpec((CG, TILE_S, TILE_L),
                             lambda i, o: (o[ids_off + i], 0, 0),
                             memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BR,),
            in_specs=[
                pl.BlockSpec((32,), lambda i, o: (0,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # pk1 stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # pk2
                sspec, sspec, sspec,
                pl.BlockSpec(memory_space=pl.ANY),  # hist: gated true-id DMA
            ],
            out_specs=[
                sspec, sspec, sspec,
                pl.BlockSpec(memory_space=pl.ANY),  # hist out = aliased in
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                (pltpu.VMEM(pk1.shape, jnp.float32) if frame_vmem
                 else pltpu.VMEM((NSLOT, CG, 2 * rect_h, rect_w),
                                 jnp.float32)),
                (pltpu.SemaphoreType.DMA if frame_vmem
                 else pltpu.SemaphoreType.DMA((2, NSLOT, CG))),
                pltpu.VMEM((NSLOT, CG, HRK, TILE_L), b.hist.dtype),
                pltpu.SemaphoreType.DMA((NSLOT, CG)),
                pltpu.VMEM((NSLOT, CG, TILE_S, TILE_L), jnp.float32),
                pltpu.VMEM((NSLOT, CG, TILE_S, TILE_L), jnp.float32),
                pltpu.VMEM((NSLOT, CG, TILE_S, TILE_L), jnp.int32),
                pltpu.SemaphoreType.DMA((3, NSLOT, CG)),
                pltpu.SMEM((4 * NSLOT * CG,), jnp.int32),
            ],
        )
        new_diff, new_cpk, new_wt, new_hist, miss = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=[
                jax.ShapeDtypeStruct(b.diff.shape, jnp.float32),
                jax.ShapeDtypeStruct(b.colorpk.shape, jnp.float32),
                jax.ShapeDtypeStruct(b.weight.shape, jnp.int32),
                jax.ShapeDtypeStruct(b.hist.shape, b.hist.dtype),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
            interpret=interpret,
        )(sp_c, params, pk1, pk2, b.diff, b.colorpk, b.weight, b.hist)
        miss0 = miss[0, 0]
        # runs beyond the budget: count their whole blocks (conservative
        # — a dropped run holds >= 1 flagged block), the same contract as
        # the escalation budgets
        over0 = jnp.maximum(n_runs - BR, 0) * CG
    elif not sparse:
        GD = max(1, min(int(getattr(cfg, "pallas_group", GROUP)), NB))
        while NB % GD:
            GD //= 2
        # visit_compact prep (see the kernel's docstring note): per-group
        # non-identity lane counts + front-packed lane lists appended to
        # the scalar-prefetch operand. The packing is ONE stable
        # multi-operand minor-dim sort on a lane-merged [NB/128, 128]
        # view (segment-major keys keep each GD-lane group contiguous, so
        # each group's non-identity lanes land at its front in lane
        # order) — the splat's cheap-compaction trick; counts come from a
        # tiny segment one-hot matmul (a [NG, GD] reshape-reduce would be
        # a narrow-lane relayout cliff).
        visit_compact = (getattr(cfg, "pallas_visit_compact", False)
                         and not state_hbm and NB % 128 == 0
                         and 2 <= GD <= 128 and 128 % GD == 0
                         and GD % 2 == 0)
        sp_d = origins
        vc_kw = {}
        if visit_compact:
            nzb = (origins & 3) > 0
            view = nzb.reshape(-1, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, view.shape, 1)
            seg = lane // GD
            key = seg * 2 + (1 - view.astype(jnp.int32))
            _, lanes_s = jax.lax.sort((key, lane % GD), dimension=1,
                                      num_keys=1, is_stable=True)
            segs = 128 // GD
            oh = (jnp.arange(128, dtype=jnp.int32)[:, None] // GD
                  == jnp.arange(segs, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
            counts = (view.astype(jnp.float32) @ oh).astype(
                jnp.int32).reshape(-1)
            # SMEM is a hard 1 MB: the dense origins table alone is
            # NB*3 i32 (768 KB at 512^3), so the lane list rides packed
            # 2-per-word (lane indices are < GD <= 128; flat pair
            # (2i, 2i+1) -> low/high 16 bits of word i)
            lanes_pk = lanes_s[:, 0::2] | (lanes_s[:, 1::2] << 16)
            sp_d = jnp.concatenate([origins, counts,
                                    lanes_pk.reshape(-1)])
            vc_kw = dict(visit_compact=True, cnt_off=origins.shape[0],
                         lanes_off=origins.shape[0] + NB // GD)
        kern = partial(_fuse_kernel, K=K, H=H, W=W, nby=b.nby, nbz=b.nbz,
                       rect_h=rect_h, rect_w=rect_w,
                       color_diff_gate=cfg.color_diff_gate,
                       depth_scale=cfg.depth_scale, group=GD,
                       lookup=lookup, hist_hbm=True, banded=banded,
                       frame_vmem=frame_vmem, defer_wb=defer_wb,
                       state_hbm=state_hbm, uniform_skip=uniform_skip,
                       ablate=tuple(getattr(cfg, "pallas_ablate", ())),
                       rowdyn=getattr(cfg, "pallas_rowdyn", False),
                       hist_gskip=getattr(cfg, "pallas_hist_gskip", False),
                       merge_mid=merge_mid, mid_h=mid_h, mid_w=mid_w,
                       **vc_kw)

        if state_hbm:
            state_spec = pl.BlockSpec(memory_space=pl.ANY)
            state_specs = [state_spec, state_spec, state_spec]
        else:
            sspec = pl.BlockSpec((GD, TILE_S, TILE_L),
                                 lambda i, o: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
            state_specs = [sspec, sspec, sspec]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB // GD,),
            in_specs=[
                pl.BlockSpec((32,), lambda i, o: (0,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # pk1 stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # pk2
                *state_specs,   # diff/colorpk/weight: ANY when state_hbm
                pl.BlockSpec(memory_space=pl.ANY),  # hist: manual gated DMA
            ],
            out_specs=[
                *state_specs,
                pl.BlockSpec(memory_space=pl.ANY),  # hist out = aliased in
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                # slot 0: per-block rect windows (DMA modes) OR the whole
                # VMEM-resident banded table (frame_vmem mode)
                (pltpu.VMEM(pk1.shape, jnp.float32) if frame_vmem
                 else pltpu.VMEM((NSLOT, GD, 2 * rect_h, rect_w),
                                 jnp.float32)),
                (pltpu.SemaphoreType.DMA if frame_vmem
                 else pltpu.SemaphoreType.DMA((2, NSLOT, GD))),
                pltpu.VMEM((NSLOT, GD, HRK, TILE_L), b.hist.dtype),
                pltpu.SemaphoreType.DMA((NSLOT, GD)),
                pltpu.VMEM((NSLOT, GD, TILE_S, TILE_L), jnp.float32),
                pltpu.VMEM((NSLOT, GD, TILE_S, TILE_L), jnp.float32),
                pltpu.VMEM((NSLOT, GD, TILE_S, TILE_L), jnp.int32),
                pltpu.SemaphoreType.DMA((3, NSLOT, GD)),
                pltpu.SMEM((4 * NSLOT * GD,), jnp.int32),
            ],
        )

        new_diff, new_cpk, new_wt, new_hist, miss = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            out_shape=[
                jax.ShapeDtypeStruct(b.diff.shape, jnp.float32),
                jax.ShapeDtypeStruct(b.colorpk.shape, jnp.float32),
                jax.ShapeDtypeStruct(b.weight.shape, jnp.int32),
                jax.ShapeDtypeStruct(b.hist.shape, b.hist.dtype),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
            interpret=interpret,
        )(sp_d, params, pk1, pk2, b.diff, b.colorpk, b.weight, b.hist)
        miss0 = miss[0, 0]
        over0 = jnp.zeros((), jnp.int32)
    else:
        # ---- sparse main pass (the 512^3 grid lever) ----
        # With pre-classification on, MOST blocks are identity (invisible
        # or behind: 82% at the 512^3 bench scene), yet the dense grid
        # above still streams every block's diff/color/weight through VMEM
        # and pays NB/GROUP grid steps of loop overhead — measured
        # 12.8 ms of a 31.6 ms frame with zero visible blocks. Sparse
        # mode gathers ONLY the non-identity blocks (full-lookup code 1
        # and closed-form free code 2 — the kernel's per-slot code branch
        # handles both) into a compacted pass below, with the histogram
        # kept full-size in HBM (aliased, gated true-id DMA). Identity
        # blocks are never touched. Blocks beyond vis_block_budget are
        # counted into the miss channel as whole blocks.
        new_diff, new_cpk = b.diff, b.colorpk
        new_wt, new_hist = b.weight, b.hist
        miss0 = None  # filled by the compacted pass below
        over0 = None

    # ---- escalation passes over compacted subsets ----
    # pass M: blocks whose footprint exceeds the pass-A rect but fits the
    # mid rect (the per-block lookup cost is ~linear in rect_h, so pass A
    # keeps the smallest rect and outliers escalate instead of everyone
    # paying for the worst case). pass B: camera-plane straddlers and
    # blocks beyond the mid rect get the whole image — their in-image
    # voxels always fuse exactly.
    fr_h = max((Hp + 7) // 8 * 8, rect_mid[0])
    fr_w = max((Wp + 127) // 128 * 128, rect_mid[1])
    if (fr_h, fr_w) != (Hp, Wp):
        pk1 = jnp.pad(pk1, ((0, fr_h - Hp), (0, fr_w - Wp)))
        pk2 = jnp.pad(pk2, ((0, fr_h - Hp), (0, fr_w - Wp)))
    HRK2 = BLOCK_VOX * K // TILE_L

    compacted_pass = partial(
        _compacted_pass, b=b, cfg=cfg, K=K, H=H, W=W, pk1=pk1, pk2=pk2,
        params=params, lookup=lookup, defer_wb=defer_wb,
        uniform_skip=uniform_skip, mid_h=mid_h, mid_w=mid_w,
        interpret=interpret)

    arrays = (new_diff, new_cpk, new_wt, new_hist)
    # Budgets clamp to NB: at most NB blocks can ever be flagged, and an
    # oversized budget is disastrous on small volumes — the gathered
    # [budget, ...] state copies ride the grid loop's carry, and under
    # a multi-device shard_map the CPU interpret path cannot alias them
    # (a 16-block dryrun shard paid 256 grid steps x 300 MB of carry
    # copies per frame, ~280 s; clamped it is sub-second). NB is a
    # multiple of GROUP=16, so the clamped budgets stay multiples of the
    # pass group sizes (16, 8 and 2).
    if sparse:
        BV = min(getattr(cfg, "vis_block_budget", 12288), NB)
        codes_a = origins & 3
        origs_a = jnp.stack([((origins >> 2) & 0xFFF) * 8,
                             ((origins >> 14) & 0x3F) * 128],
                            axis=-1).reshape(-1)
        arrays, miss0, over0 = compacted_pass(
            arrays, codes_a > 0, origs_a,
            (rect_h, rect_w), BV, GROUP, codes=codes_a, hist_hbm=True,
            st_hbm=cfg.pallas_state_hbm, fv=frame_vmem, band=banded,
            merge=merge_mid)
    if merge_mid:
        # mid blocks fused inside pass A (code 3) — no separate pass,
        # no mid budget to overflow
        miss_m = jnp.zeros((), jnp.int32)
        over_m = jnp.zeros((), jnp.int32)
    else:
        BM = min(getattr(cfg, "mid_block_budget", 2048), NB)
        arrays, miss_m, over_m = compacted_pass(
            arrays, flag_mid, origins_mid, rect_mid, BM, 8,
            fv=frame_vmem, band=banded)
    B2 = min(getattr(cfg, "near_block_budget", 128), NB)
    # pass B's full-image window would blow the vreg budget as a value —
    # it keeps the per-block DMA form (banded single-copy when the table
    # was banded for frame_vmem)
    arrays, miss_b, over_b = compacted_pass(
        arrays, flag_full, None, (fr_h, fr_w), B2, 2,
        fv=False, band=banded or frame_vmem)
    new_diff, new_cpk, new_wt, new_hist = arrays

    new_state = b.replace(diff=new_diff, colorpk=new_cpk, weight=new_wt,
                          hist=new_hist, n_obs=b.n_obs + 1)
    # budget overflows count the whole blocks we could not fuse
    return new_state, (miss0 + miss_m + miss_b
                       + (over0 + over_m + over_b) * BLOCK_VOX)


def fuse_frames2_blocked_impl(b: BlockedTSDFState, depth1, color1, mask1,
                              e1, depth2, color2, mask2, e2,
                              intrinsic, cfg: FusionConfig):
    """Fuse TWO relabeled frames in ONE dense kernel pass (the
    paired-frame throughput form): per voxel, frame 1's update runs and
    commits to the output block, then frame 2's update reads that output
    — the composition is exactly two sequential single-frame launches,
    so the result is BIT-IDENTICAL to calling fuse_frame_blocked_impl
    twice with the same masks (tests/test_fuse_pair.py), while the dense
    pass's per-frame fixed costs (grid steps, per-block visits, state
    streaming, kernel prep — the measured ~10 ms zero-visible floor at
    512^3, PERFORMANCE.md r4e) are paid once per PAIR.

    Blocks flagged for the full-image pass B in EITHER frame are forced
    to identity in the pair pass and fused by two sequential pass-B
    launches (frame order preserved — pass B's full-image window
    computes the exact update for any vis code). Requires the
    frame_vmem "gather" configuration; anything else falls back to two
    sequential single-frame calls. The association-side semantics of
    pairing (frame 2's probe sees the pre-pair histogram) live in
    fusion/pipeline.py, NOT here — this function is given both frames'
    already-relabeled masks."""
    H, W = depth1.shape
    if not pair_prepable(cfg, H, W):
        b1, m1 = fuse_frame_blocked_impl(b, depth1, color1, mask1, e1,
                                         intrinsic, cfg)
        b2, m2 = fuse_frame_blocked_impl(b1, depth2, color2, mask2, e2,
                                         intrinsic, cfg)
        return b2, m1 + m2

    T1, origins1, ff1, params1 = pair_prep_static(b, depth1, color1, e1,
                                                  intrinsic, cfg)
    T2, origins2, ff2, params2 = pair_prep_static(b, depth2, color2, e2,
                                                  intrinsic, cfg)
    T1 = inject_mask_banded(T1, mask1)
    T2 = inject_mask_banded(T2, mask2)
    return fuse_frames2_blocked_prepped(
        b, (T1, origins1, ff1, params1), (T2, origins2, ff2, params2),
        H, W, cfg)


def pair_prepable(cfg: FusionConfig, H: int, W: int) -> bool:
    """True when the paired dense kernel supports this config (the
    frame_vmem "gather" configuration with both banded tables inside the
    VMEM-resident budget); anything else makes fuse_frames2_blocked_impl
    fall back to two sequential single-frame launches."""
    lookup = getattr(cfg, "pallas_lookup", "gather_t")
    rect_h, rect_w = getattr(cfg, "pallas_rect", (RECT_H, RECT_W))
    rect_mid = getattr(cfg, "pallas_rect_mid", (192, 384))
    fh = max((max(H, rect_h) + 7) // 8 * 8, rect_mid[0])
    fw = max((max(W, rect_w) + 127) // 128 * 128, rect_mid[1])
    return (lookup == "gather"
            and not getattr(cfg, "pallas_banded_rect", False)
            and getattr(cfg, "pallas_frame_vmem", True)
            # TWO banded tables must fit the VMEM-resident budget
            and 2 * (2 * fh * fw * 4) <= 14 * 1024 * 1024
            and not getattr(cfg, "pallas_sparse", False)
            and not getattr(cfg, "pallas_compact", False)
            and not cfg.pallas_state_hbm
            and not getattr(cfg, "pallas_visit_compact", False))


def pair_prep_static(b: BlockedTSDFState, depth, color, e2i, intrinsic,
                     cfg: FusionConfig):
    """STATE-INDEPENDENT prep of one frame for the paired kernel: the
    banded depth+color table (WITHOUT the mask bits — see
    inject_mask_banded), packed origins + preclass, the pass-B flags and
    the camera params. Reads only the volume GEOMETRY (vol_start, voxel,
    mu, block dims — fixed for a whole chunk), never the fused arrays,
    so a chunk driver can vmap it over every frame in ONE dispatch
    before the scan (PERFORMANCE.md r5: run serially inside the scan
    these latency-bound small ops cost ~2.9 ms/frame)."""
    H, W = depth.shape
    rect_h, rect_w = getattr(cfg, "pallas_rect", (RECT_H, RECT_W))
    rect_mid = getattr(cfg, "pallas_rect_mid", (192, 384))
    Hp, Wp = max(H, rect_h), max(W, rect_w)
    fh = max((Hp + 7) // 8 * 8, rect_mid[0])
    fw = max((Wp + 127) // 128 * 128, rect_mid[1])
    preclass = getattr(cfg, "pallas_preclass", True)
    Km = intrinsic.astype(jnp.float32)

    # pk1 carries depth only — the mask rides in once the (state-
    # dependent) association relabels it
    pk1 = depth.astype(jnp.float32)
    c = color.astype(jnp.float32)
    pk2 = c[..., 0] + c[..., 1] * 256.0 + c[..., 2] * 65536.0
    if (fh, fw) != (H, W):
        pk1 = jnp.pad(pk1, ((0, fh - H), (0, fw - W)))
        pk2 = jnp.pad(pk2, ((0, fh - H), (0, fw - W)))
    pk12 = jnp.stack([pk1.reshape(fh // 8, 8, fw),
                      pk2.reshape(fh // 8, 8, fw)],
                     axis=1).reshape(2 * fh, fw)
    cls = (dict(depth=depth, depth_scale=cfg.depth_scale, mu=b.mu)
           if preclass else {})
    # origins computed vs the pre-band (Hp, Wp) table dims exactly
    # like the single-frame path — clamps stay valid in the larger
    # (fh, fw) table
    origins, _fm, ff, _om = _block_origins(
        b, e2i, intrinsic, Hp, Wp, rect_h, rect_w,
        rect_mid=rect_mid, merge_mid=True, **cls)
    E = e2i.astype(jnp.float32)
    base = E[:3, :3] @ b.vol_start + E[:3, 3]
    params = jnp.concatenate([
        E[:3, 0] * b.voxel[0], E[:3, 1] * b.voxel[1],
        E[:3, 2] * b.voxel[2], base,
        jnp.stack([Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2]]),
        b.mu[None],
        jnp.zeros((15,), jnp.float32),
    ]).astype(jnp.float32)
    return pk12, origins, ff, params


def inject_mask_banded(T_pre, mask):
    """Add a relabeled mask's id bits into a pair_prep_static table: the
    depth values live in the even 8-row bands of the [2*fh, fw] banded
    layout; id * 65536 lands exactly like _pack_frame's pk1 (u16 depth
    in the low bits, id above — both exact in f32)."""
    H, W = mask.shape
    fh, fw = T_pre.shape[0] // 2, T_pre.shape[1]
    mpad = mask.astype(jnp.float32)
    if (fh, fw) != (H, W):
        mpad = jnp.pad(mpad, ((0, fh - H), (0, fw - W)))
    Tb = T_pre.reshape(fh // 8, 2, 8, fw)
    Tb = Tb.at[:, 0].add(mpad.reshape(fh // 8, 8, fw) * 65536.0)
    return Tb.reshape(2 * fh, fw)


def fuse_frames2_blocked_prepped(b: BlockedTSDFState, prep1, prep2,
                                 H: int, W: int, cfg: FusionConfig):
    """Paired-kernel launch given both frames' prepped inputs
    (pair_prep_static + inject_mask_banded): the pair dense pass, then
    the two sequential pass-B launches. See fuse_frames2_blocked_impl
    for semantics; this entry point exists so chunk drivers can batch
    the state-independent prep outside their scan."""
    K = b.hist.shape[1] * TILE_L // BLOCK_VOX
    NB = b.diff.shape[0]
    rect_h, rect_w = getattr(cfg, "pallas_rect", (RECT_H, RECT_W))
    rect_mid = getattr(cfg, "pallas_rect_mid", (192, 384))
    mid_h, mid_w = rect_mid
    fh = max((max(H, rect_h) + 7) // 8 * 8, rect_mid[0])
    fw = max((max(W, rect_w) + 127) // 128 * 128, rect_mid[1])
    defer_wb = getattr(cfg, "pallas_defer_writeback", True)
    uniform_skip = getattr(cfg, "pallas_uniform_skip", True)
    interpret = jax.default_backend() == "cpu"

    T1, origins1, ff1, params1 = prep1
    T2, origins2, ff2, params2 = prep2
    excl = ff1 | ff2
    # pair pass skips pass-B blocks of EITHER frame (frame order would
    # break for them); force their codes to identity here
    o1m = jnp.where(excl, origins1 & ~3, origins1)
    o2m = jnp.where(excl, origins2 & ~3, origins2)
    sp = jnp.concatenate([o1m, o2m])
    params_pair = jnp.concatenate([params1, params2])
    Tpair = jnp.concatenate([T1, T2], axis=0)          # [4*fh, fw]

    GD = max(1, min(int(getattr(cfg, "pallas_group", GROUP)), NB))
    while NB % GD:
        GD //= 2
    HRK = BLOCK_VOX * K // TILE_L
    kern = partial(_fuse_kernel, K=K, H=H, W=W, nby=b.nby, nbz=b.nbz,
                   rect_h=rect_h, rect_w=rect_w,
                   color_diff_gate=cfg.color_diff_gate,
                   depth_scale=cfg.depth_scale, group=GD,
                   lookup="gather", hist_hbm=True, banded=False,
                   frame_vmem=True, defer_wb=defer_wb,
                   state_hbm=False, uniform_skip=uniform_skip,
                   ablate=tuple(getattr(cfg, "pallas_ablate", ())),
                   rowdyn=getattr(cfg, "pallas_rowdyn", False),
                   hist_gskip=getattr(cfg, "pallas_hist_gskip", False),
                   merge_mid=True, mid_h=mid_h, mid_w=mid_w,
                   pair=True, orig2_off=NB, tab2_off=2 * fh)
    sspec = pl.BlockSpec((GD, TILE_S, TILE_L), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB // GD,),
        in_specs=[
            pl.BlockSpec((64,), lambda i, o: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # paired banded table
            pl.BlockSpec(memory_space=pl.ANY),  # (unused twin operand)
            sspec, sspec, sspec,
            pl.BlockSpec(memory_space=pl.ANY),  # hist: gated true-id DMA
        ],
        out_specs=[
            sspec, sspec, sspec,
            pl.BlockSpec(memory_space=pl.ANY),  # hist out = aliased in
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM(Tpair.shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((NSLOT, GD, HRK, TILE_L), b.hist.dtype),
            pltpu.SemaphoreType.DMA((NSLOT, GD)),
            pltpu.VMEM((NSLOT, GD, TILE_S, TILE_L), jnp.float32),
            pltpu.VMEM((NSLOT, GD, TILE_S, TILE_L), jnp.float32),
            pltpu.VMEM((NSLOT, GD, TILE_S, TILE_L), jnp.int32),
            pltpu.SemaphoreType.DMA((3, NSLOT, GD)),
            # +GD slots: the pair hist-dirty flags (index 4*NSLOT*group+g)
            pltpu.SMEM(((4 * NSLOT + 1) * GD,), jnp.int32),
        ],
    )
    new_diff, new_cpk, new_wt, new_hist, miss = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct(b.diff.shape, jnp.float32),
            jax.ShapeDtypeStruct(b.colorpk.shape, jnp.float32),
            jax.ShapeDtypeStruct(b.weight.shape, jnp.int32),
            jax.ShapeDtypeStruct(b.hist.shape, b.hist.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )(sp, params_pair, Tpair, Tpair, b.diff, b.colorpk, b.weight, b.hist)

    # pass B, frame order preserved, over the union of excluded blocks:
    # a block needing B in one frame still needs its OTHER frame's exact
    # update, and the full-image window computes it for any vis code
    # (code 3 routes as a full lookup; code 0 commits the identity)
    arrays = (new_diff, new_cpk, new_wt, new_hist)
    B2 = min(getattr(cfg, "near_block_budget", 128), NB)
    miss_b = jnp.zeros((), jnp.int32)
    over_b = jnp.zeros((), jnp.int32)
    for origins_f, ff_f, Tf, params_f in ((origins1, ff1, T1, params1),
                                          (origins2, ff2, T2, params2)):
        code_f = origins_f & 3
        codes_bf = jnp.where(ff_f, 1, jnp.where(code_f == 3, 1, code_f))
        arrays, m_f, o_f = _compacted_pass(
            arrays, excl, None, (fh, fw), B2, 2,
            b=b, cfg=cfg, K=K, H=H, W=W, pk1=Tf, pk2=Tf,
            params=params_f, lookup="gather", defer_wb=defer_wb,
            uniform_skip=uniform_skip, mid_h=mid_h, mid_w=mid_w,
            interpret=interpret, codes=codes_bf, fv=False, band=True)
        miss_b = miss_b + m_f
        over_b = over_b + o_f
    new_diff, new_cpk, new_wt, new_hist = arrays

    new_state = b.replace(diff=new_diff, colorpk=new_cpk, weight=new_wt,
                          hist=new_hist, n_obs=b.n_obs + 2)
    return new_state, miss[0, 0] + miss_b + over_b * BLOCK_VOX
