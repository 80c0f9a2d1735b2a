"""Splat renderer/probe — the TPU-native fast path for raycasting.

Why: the reference's per-ray march (``src/SfM_CUDA/viewer.cu:17-86``,
``tsdf.cu:72-135``) is thread-divergent random access — ideal for CUDA,
pathological on TPU (measured 18.5 s/frame via the vectorized while_loop at
256^3, PERFORMANCE.md). This module renders the *same surface* by dense
forward projection instead:

1. surface shell = voxels with normalized SDF in (-shell_band, 0) — the
   first negative band the marcher's zero-crossing sits on (0.999 default;
   thinner bands punch holes at grazing surfaces because the projective
   TSDF is not 1-Lipschitz along the image plane);
2. two-level compaction BEFORE any geometry — active blocks ([NB] wide
   reduce + nonzero), then shell rows within them ([MB*16] 1-D nonzero);
   only the compacted [max_rows, 128] rows are projected. Every
   intermediate stays 1-D or 128-lane wide (narrow-lane layouts cost
   ~100 ms/frame in relayouts, PERFORMANCE.md);
3. level-2 compaction either exact (flat nonzero) or via one
   multi-operand minor-dim sort packing each row's visible voxels
   z-first with a per-row cap (cfg.splat_row_cap — 3x cheaper; clipped
   voxels feed the overflow channel);
4. ONE scatter-min of a packed key (quantized z << idx_bits | surface
   index) resolves depth and winner together;
5. shading reads each winner voxel's contiguous K-bin histogram row with
   ONE row-gather (the voxel-major hist layout exists for this);
6. 1-px holes (voxel spacing > pixel spacing) closed by 9 dense shifted
   minimums.

Exact-parity rendering stays available in fusion/raycast.py (the march);
this path trades trilinear interpolation at the crossing for
nearest-surface-voxel values, ~400x faster. The orbit camera's quirky
geometry (ray origin c differs from the rot translation,
``viewer.cu:140-146``) is reproduced exactly via an equivalent pinhole
factorization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from slam_maskrcnn_tpu.fusion.raycast import INSTANCE_PALETTE
from slam_maskrcnn_tpu.fusion.state import FusionConfig

# numpy scalar, NOT jnp: a module-level jax scalar is a concrete device
# array; traces that capture it get it lifted as a hidden executable
# parameter, and the jax-0.9 C++ fastpath then under-supplies buffers on
# the second call of any capturing jitted function ("Execution supplied 14
# buffers but compiled program expected 15"). A numpy scalar embeds as a
# literal.
BIG = np.float32(3.0e38)


def pinhole_of_extrinsic(extrinsic, intrinsic):
    """Standard camera: s = M p + m4, u = s_x/s_z (the probe camera of
    back_proj_kernel, tsdf.cu:81-89)."""
    E = jnp.asarray(extrinsic, jnp.float32)
    Km = jnp.asarray(intrinsic, jnp.float32)[:3, :3]
    return Km @ E[:3, :3], Km @ E[:3, 3]


def pinhole_of_orbit(angle, dist, intrinsic):
    """The viewer's orbit camera (viewer.cu:140-146) as an exact pinhole.

    Rays are c + t * (R Ki h + tr - c). Solving for the pixel of a world
    point p: with w = R^T (p - c) and e = R^T (tr - c),
    u = fx (1 + e_z) w_x / w_z + (cx - fx e_x) (same for v) — a pinhole
    with scaled focal length and shifted center.
    """
    angle = jnp.asarray(angle, jnp.float32)
    dist = jnp.asarray(dist, jnp.float32)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    R = jnp.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    R = R.at[0, 0].set(ca).at[0, 2].set(-sa).at[2, 0].set(sa).at[2, 2].set(ca)
    tr = jnp.stack([dist * sa, jnp.zeros_like(dist), dist - dist * ca])
    c = jnp.stack([(dist + 0.5) * sa, jnp.zeros_like(dist),
                   (dist + 0.5) - (dist + 0.5) * ca])
    e = R.T @ (tr - c)
    Km = jnp.asarray(intrinsic, jnp.float32)
    fx, fy, cx, cy = Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2]
    Kp = jnp.array([[0.0, 0, 0], [0, 0, 0], [0, 0, 1]], jnp.float32)
    Kp = Kp.at[0, 0].set(fx * (1 + e[2])).at[0, 2].set(cx - fx * e[0])
    Kp = Kp.at[1, 1].set(fy * (1 + e[2])).at[1, 2].set(cy - fy * e[1])
    M = Kp @ R.T
    m4 = -(Kp @ (R.T @ c))
    return M, m4


def splat_zbuffer(b, M, m4, H, W, max_blocks: int = 4096,
                  max_surface: int = 512 * 1024, max_rows: int = 8192,
                  shell_band: float = 0.999, row_cap: int = 0,
                  fill: bool = False):
    """Core splat (see _splat_zbuffer_arrays). Convenience pytree entry."""
    return _splat_zbuffer_arrays(b.diff, b.vol_start, b.voxel, M, m4,
                                 H, W, b.nby, b.nbz, max_blocks,
                                 max_surface, max_rows, shell_band, row_cap,
                                 fill)


def _splat_zbuffer_arrays(diff, vol_start, voxel, M, m4, H, W,
                          nby: int, nbz: int, max_blocks: int = 4096,
                          max_surface: int = 512 * 1024,
                          max_rows: int = 8192, shell_band: float = 0.999,
                          row_cap: int = 0, fill: bool = False):
    """Core splat: returns (zbuf [H*W] f32, winner voxel id [H*W] i32 with
    -1 for empty, overflow, clip). Voxel id = blk * 2048 + s * 128 + l,
    indexing the flat voxel-major views of the blocked arrays. `overflow`
    counts HARD budget loss (active blocks beyond max_blocks, shell rows
    beyond max_rows, exact-form surface beyond max_surface) — nonzero
    means the z-buffer silently dropped surface and the caller should
    raise the budgets (it feeds the fusion-step miss channel). `clip`
    counts row-cap'd z-order-redundant entries (see _splat_from_rows) —
    reported separately, not a miss.

    Takes explicit arrays (not the state pytree) so jitted callers have no
    unused pytree leaves — a jax-0.9 fastpath bug miscounts donated/pruned
    buffers on repeat calls otherwise.
    """
    NB, S, L = diff.shape
    # shell band: (-0.999, 0) — the full first-negative band. A thinner
    # band was tried (the metric SDF is 1-Lipschitz, so 0.5 would be
    # hole-free) but this is a PROJECTIVE TSDF (camera-z difference,
    # tsdf.cu:49): its gradient along grazing surfaces exceeds 1/voxel and
    # a thin band punches probe holes that break association id-stability
    # (caught by test_pipeline_pallas). Row occupancy is also insensitive
    # to band thickness (a 128-lane row spans 32 z-voxels), so the win
    # would have been small anyway.
    #
    # Compaction happens at 128-lane-ROW granularity BEFORE any geometry:
    # one fused pass over diff marks shell rows, one nonzero compacts
    # them, and everything downstream (projection included) runs on the
    # [max_rows, 128] compacted view. Earlier versions projected all
    # voxels of every active BLOCK first (8.4M voxels at 256^3) and
    # compacted after — the dense projection itself was ~1/3 of the probe.
    # Layout discipline (measured, round 2): every intermediate here is
    # either 1-D or has a 128-multiple lane dim. A [NB, 16]-shaped
    # "shell rows" bitmap looks natural but its 16-lane layout cliffs
    # cost ~100 ms/frame at 256^3 in reductions/gathers.
    #
    # Two-level compaction (nonzero cost scales with its INPUT — the
    # bincount scatter-add, ~12-18 ns/elem): blocks first ([NB] via a
    # lane-merged [NB, 2048] reduce), then rows within active blocks.
    rows = _compact_shell(diff, vol_start, voxel, nby, nbz, max_blocks,
                          max_rows, shell_band)
    return _splat_from_rows(rows, M, m4, H, W, max_blocks, max_rows,
                            max_surface, row_cap, fill)


def _compact_shell(diff, vol_start, voxel, nby: int, nbz: int,
                   max_blocks: int, max_rows: int, shell_band: float):
    """State-side half of the splat: compact the surface shell to
    [max_rows, 128] rows and compute their world positions. Camera-free —
    the orbit viewer computes this ONCE per fused state and renders many
    frames from it (the reference fuses, then orbits forever,
    kernel.cpp:101-107)."""
    NB, S, L = diff.shape
    shell3 = (diff < 0.0) & (diff > -shell_band)
    act = shell3.reshape(NB, S * L).any(axis=1)          # wide reduce -> 1-D
    n_act = act.sum()
    (bids,) = jnp.nonzero(act, size=max_blocks, fill_value=NB)
    bid_ok = bids < NB
    bids_c = jnp.minimum(bids, NB - 1)
    diff_a = diff[bids_c]                   # [MB, S, L] wide row gather
    sh_a = ((diff_a < 0.0) & (diff_a > -shell_band)
            & bid_ok[:, None, None])
    row_any = sh_a.reshape(-1, L).any(axis=1)            # [MB*S] 1-D
    (rsel,) = jnp.nonzero(row_any, size=max_rows, fill_value=row_any.size)
    rid_ok = rsel < row_any.size
    rsel_c = jnp.minimum(rsel, row_any.size - 1)

    diff_r = diff_a.reshape(-1, L)[rsel_c]              # [MR, 128] row gather
    shell_r = ((diff_r < 0.0) & (diff_r > -shell_band)
               & rid_ok[:, None])
    # true row id (block * S + s) for world coordinates: a small scalar
    # gather into the [MB] id table (~130 ns/idx — max_rows of them)
    rids_c = bids_c[rsel_c // S] * S + rsel_c % S

    # voxel world positions from row ids (row = blk * S + s) + lane iota
    blk = rids_c // S
    s_r = rids_c % S
    bxf = (blk // (nbz * nby)).astype(jnp.float32)
    byf = ((blk // nbz) % nby).astype(jnp.float32)
    bzf = (blk % nbz).astype(jnp.float32)
    l_i = jax.lax.broadcasted_iota(jnp.int32, (diff_r.shape[0], L), 1)
    vlin = s_r[:, None] * L + l_i                       # intra-block voxel
    dx = (vlin // (8 * 32)).astype(jnp.float32)
    dy = ((vlin // 32) % 8).astype(jnp.float32)
    dz = (vlin % 32).astype(jnp.float32)
    gx = bxf[:, None] * 8 + dx
    gy = byf[:, None] * 8 + dy
    gz = bzf[:, None] * 32 + dz
    px = vol_start[0] + gx * voxel[0]
    py = vol_start[1] + gy * voxel[1]
    pz = vol_start[2] + gz * voxel[2]
    code_r = (blk[:, None] * (S * L) + vlin).astype(jnp.int32)
    n_rows = row_any.sum()
    # block-budget overflow in VOXELS, using the true tile shape (S, L)
    # rather than a hardcoded 16*L — the safety channel and tests depend
    # on this count staying exact under tile-shape changes
    over_blocks = jnp.maximum(n_act - max_blocks, 0) * (S * L)
    return dict(px=px, py=py, pz=pz, shell_r=shell_r, code_r=code_r,
                over_blocks=over_blocks, n_rows=n_rows)


def _splat_from_rows(rows, M, m4, H, W, max_blocks: int, max_rows: int,
                     max_surface: int, row_cap: int, fill: bool):
    """Camera-side half of the splat: project the compacted shell rows,
    level-2 compact, packed-key scatter, optional key-space hole fill,
    decode. See _splat_zbuffer_arrays for the contract."""
    px, py, pz = rows["px"], rows["py"], rows["pz"]
    shell_r, code_r = rows["shell_r"], rows["code_r"]
    over_blocks, n_rows = rows["over_blocks"], rows["n_rows"]
    L = px.shape[1]

    sx = M[0, 0] * px + M[0, 1] * py + M[0, 2] * pz + m4[0]
    sy = M[1, 0] * px + M[1, 1] * py + M[1, 2] * pz + m4[1]
    sz = M[2, 0] * px + M[2, 1] * py + M[2, 2] * pz + m4[2]
    safe = jnp.where(jnp.abs(sz) < 1e-9, 1e-9, sz)
    u = jnp.floor(sx / safe + 0.5).astype(jnp.int32)
    v = jnp.floor(sy / safe + 0.5).astype(jnp.int32)
    vis_r = shell_r & (sz > 1e-6) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    pix_r = jnp.where(vis_r, v * W + u, H * W)
    z_r = jnp.where(vis_r, sz, BIG)

    # level-2 compaction, two forms:
    # * row_cap == 0 (exact, default): flat jnp.nonzero over
    #   max_rows*128 lanes (15.4 ms at the 256^3 budgets — its bincount
    #   scatter-add scales with the input size).
    # * row_cap > 0 (fast): ONE multi-operand minor-dim sort packs each
    #   row's visible entries to the front in z order (4.8 ms measured),
    #   then keep `row_cap` lanes per row. A row spans 4 z-columns, so
    #   visible shell voxels per row are bounded by ~shell thickness x 4
    #   (~20 at fine volumes); clipped entries are the row's FARTHEST
    #   (they lose the z-test against kept closer ones almost always)
    #   and the clipped count still feeds the overflow/miss channel.
    #   Coarse volumes (<=64^3, where the whole object is "near
    #   surface") overflow small caps — use the exact form there.
    if row_cap:
        cap = int(min(L, row_cap))
        zkey = jnp.where(vis_r, z_r, BIG)
        z_sd, pix_sd, code_sd = jax.lax.sort(
            (zkey, pix_r, code_r), dimension=1, num_keys=1)
        sel_ok = (z_sd[:, :cap] < BIG / 2).reshape(-1)
        z_s = z_sd[:, :cap].reshape(-1)        # invalid lanes already BIG
        pix_s = jnp.where(sel_ok, pix_sd[:, :cap].reshape(-1), H * W)
        code_s = code_sd[:, :cap].reshape(-1)
        cap_clipped = jnp.maximum(vis_r.sum(axis=1) - cap, 0).sum()
    else:
        (sel,) = jnp.nonzero(vis_r.reshape(-1), size=max_surface,
                             fill_value=vis_r.size)
        sel_ok = sel < vis_r.size
        sel_c = jnp.minimum(sel, vis_r.size - 1)
        z_s = jnp.where(sel_ok, z_r.reshape(-1)[sel_c], BIG)
        pix_s = jnp.where(sel_ok, pix_r.reshape(-1)[sel_c], H * W)
        code_s = code_r.reshape(-1)[sel_c]
        # exact-form truncation beyond max_surface drops ARBITRARY
        # entries (nonzero fill order, not z order) — hard loss
        cap_clipped = jnp.zeros((), jnp.int32)
        over_blocks = over_blocks + jnp.maximum(vis_r.sum() - max_surface,
                                                0)
    n_surface = z_s.size

    # two channels (VERDICT r2 "no silent caps"): `overflow` is HARD loss
    # (block/row budget exceeded — surface voxels never reached the
    # z-buffer; raise the budgets), `clip` counts row-cap'd entries, which
    # are each row's FARTHEST candidates behind >= cap nearer voxels in
    # the same 4 z-columns — z-order-redundant in practice (cap 24 at the
    # 512^3 bench scene: 217 clipped, 65 of 307k pixels changed, coverage
    # identical). Callers fold `overflow` into the miss channel and report
    # `clip` separately.
    overflow = (over_blocks
                + jnp.maximum(n_rows - max_rows, 0) * L)
    clip = cap_clipped

    # ONE scatter-min of a packed key resolves depth AND winner: key =
    # quantized-z << idx_bits | compact-surface index. The old
    # zbuf-scatter + z_at-gather + winner-scatter triple cost ~50% more;
    # z quantization only reorders voxels within one quantum — invisible
    # to shading and association. The quantization range adapts to the
    # ACTUAL visible camera-space depth (a fixed range would collapse all
    # content beyond it into the top quantum, corrupting the winner for
    # far surfaces); at default budgets idx_bits is 18-20, so z gets
    # 11-13 bits = a quantum of zmax/2048..zmax/8192 (~1-4 mm at indoor
    # ranges). zbuf is returned dequantized (it only feeds emptiness
    # tests and hole-fill ordering).
    idx_bits = max(int(n_surface - 1).bit_length(), 1)
    z_bits = 31 - idx_bits
    assert z_bits >= 8, f"surface size {n_surface} leaves {z_bits} z bits"
    z_levels = float(2 ** z_bits)
    zmax = jnp.max(jnp.where(z_s < BIG / 2, z_s, 0.0))
    z_scale = (z_levels - 1.0) / jnp.maximum(zmax, 1e-3)
    zq = jnp.clip(z_s * z_scale, 0.0, z_levels - 1.0).astype(jnp.int32)
    idx32 = jax.lax.broadcasted_iota(jnp.int32, (n_surface,), 0)
    key = jnp.where(sel_ok, (zq << idx_bits) | idx32, jnp.int32(2 ** 31 - 1))
    kbuf = jnp.full((H * W + 1,), jnp.int32(2 ** 31 - 1), jnp.int32)
    kbuf = kbuf.at[pix_s].min(key)
    kb = kbuf[:-1]
    if fill:
        # hole fill in KEY space before decoding: empty pixels take the
        # min neighbor key, whose z-major packing makes min == nearest-z
        # neighbor — one i32 array through the 8 shifted minimums instead
        # of the (zbuf, vid) pair _fill_holes moves (half the traffic)
        kb2 = kb.reshape(H, W)
        empty = kb2 == 2 ** 31 - 1
        best = jnp.full_like(kb2, 2 ** 31 - 1)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                best = jnp.minimum(best, jnp.roll(kb2, (dy, dx),
                                                  axis=(0, 1)))
        kb = jnp.where(empty, best, kb2).reshape(-1)
    have = kb != 2 ** 31 - 1
    widx = jnp.minimum(kb & (2 ** idx_bits - 1), n_surface - 1)
    vid = jnp.where(have, code_s[widx], -1)
    zbuf = jnp.where(have,
                     (kb >> idx_bits).astype(jnp.float32) / z_scale,
                     BIG)
    return zbuf, vid, overflow, clip


def select_candidates(rows, M, m4, row_cap: int, approx: bool = False):
    """Camera-guided candidate selection: the level-2 sort+cap of
    _splat_from_rows, returning ONLY the selected voxel codes
    ([max_rows * cap] i32, -1 = empty slot) plus the overflow/clip
    counters. The north-star chunk carries this single array across
    frames (like the shell itself): the per-row nearest-`cap` set drifts
    negligibly over a few hundredths of a radian of camera motion, while
    the per-frame projection is recomputed EXACTLY from the codes — so
    staleness affects only which candidates compete, never where they
    land. Refreshing both every cfg.shell_refresh_every frames skips the
    [max_rows, 128] projection + 3-operand sort on carry frames."""
    px, py, pz = rows["px"], rows["py"], rows["pz"]
    shell_r, code_r = rows["shell_r"], rows["code_r"]
    L = px.shape[1]
    cap = int(min(L, row_cap)) if row_cap else L

    sx = M[0, 0] * px + M[0, 1] * py + M[0, 2] * pz + m4[0]
    sy = M[1, 0] * px + M[1, 1] * py + M[1, 2] * pz + m4[1]
    sz = M[2, 0] * px + M[2, 1] * py + M[2, 2] * pz + m4[2]
    safe = jnp.where(jnp.abs(sz) < 1e-9, 1e-9, sz)
    u = jnp.floor(sx / safe + 0.5).astype(jnp.int32)
    v = jnp.floor(sy / safe + 0.5).astype(jnp.int32)
    vis_r = shell_r & (sz > 1e-6)
    _ = (u, v)  # in-image test deferred to render time (exact per frame)
    zkey = jnp.where(vis_r, sz, BIG)
    if approx:
        # TPU-native selection: lax.approx_min_k beats the full lane
        # sort the same way approx_max_k beats top_k (CLAUDE.md) — the
        # refresh's [max_rows, 128] 2-operand sort costs ~3-5 ms/frame
        # amortized at the 512^3 budgets. Approximation: per row, up to
        # (1 - recall) of the true nearest-cap set may be swapped for
        # slightly farther candidates — same failure class as the row
        # cap itself (z-order-redundant entries), bounded by the winner
        # agreement A/B (PERFORMANCE.md r5). Dropped-candidate pixels
        # still z-test exactly at render time.
        z_ap, idx_ap = jax.lax.approx_min_k(zkey, cap,
                                            recall_target=0.95)
        # per-row code pickup as a dense one-hot contraction —
        # take_along_axis over [R, 128] is the slow gather form
        oh = (idx_ap[..., None]
              == jnp.arange(L, dtype=jnp.int32)[None, None, :])
        code_sel = jnp.sum(
            jnp.where(oh, code_r[:, None, :], 0), axis=-1)
        sel_ok = z_ap < BIG / 2
        codes = jnp.where(sel_ok, code_sel, -1).reshape(-1)
    else:
        z_sd, code_sd = jax.lax.sort((zkey, code_r), dimension=1,
                                     num_keys=1)
        sel_ok = z_sd[:, :cap] < BIG / 2
        codes = jnp.where(sel_ok, code_sd[:, :cap], -1).reshape(-1)
    clip = jnp.maximum(vis_r.sum(axis=1) - cap, 0).sum()
    return codes, rows["over_blocks"] + jnp.maximum(
        rows["n_rows"] - px.shape[0], 0) * L, clip


def decode_candidates(codes, vol_start, voxel, nby: int, nbz: int):
    """Camera-independent half of splat_from_candidates: candidate codes
    -> world positions (px, py, pz, valid). The north-star chunk hoists
    this ONCE per refresh segment (the decode is invariant between
    candidate refreshes; only the projection is per-frame) instead of
    re-deriving ~1M positions inside every scanned frame."""
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import BX, BY, BZ
    S_L = 16 * 128
    ok0 = codes >= 0
    csafe = jnp.maximum(codes, 0)
    blk = csafe // S_L
    vlin = csafe % S_L
    bxf = (blk // (nbz * nby)).astype(jnp.float32)
    byf = ((blk // nbz) % nby).astype(jnp.float32)
    bzf = (blk % nbz).astype(jnp.float32)
    dx = (vlin // (BY * BZ)).astype(jnp.float32)
    dy = ((vlin // BZ) % BY).astype(jnp.float32)
    dz = (vlin % BZ).astype(jnp.float32)
    px = vol_start[0] + (bxf * BX + dx) * voxel[0]
    py = vol_start[1] + (byf * BY + dy) * voxel[1]
    pz = vol_start[2] + (bzf * BZ + dz) * voxel[2]
    return px, py, pz, ok0


def splat_from_candidates(codes, vol_start, voxel, nby: int, nbz: int,
                          M, m4, H, W, fill: bool = True, decoded=None):
    """Render-phase splat over a precomputed candidate code set
    ([N] i32, -1 empty): decode codes to world positions arithmetically,
    project with the CURRENT camera, packed-key scatter-min, hole fill.
    `decoded` (optional): a precomputed decode_candidates(...) tuple —
    pass it when the same candidate set renders several frames.
    Returns (zbuf [H*W], vid [H*W]) — same contract as _splat_from_rows'
    first two outputs."""
    if decoded is None:
        decoded = decode_candidates(codes, vol_start, voxel, nby, nbz)
    px, py, pz, ok0 = decoded

    sx = M[0, 0] * px + M[0, 1] * py + M[0, 2] * pz + m4[0]
    sy = M[1, 0] * px + M[1, 1] * py + M[1, 2] * pz + m4[1]
    sz = M[2, 0] * px + M[2, 1] * py + M[2, 2] * pz + m4[2]
    safe = jnp.where(jnp.abs(sz) < 1e-9, 1e-9, sz)
    u = jnp.floor(sx / safe + 0.5).astype(jnp.int32)
    v = jnp.floor(sy / safe + 0.5).astype(jnp.int32)
    vis = ok0 & (sz > 1e-6) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    pix = jnp.where(vis, v * W + u, H * W)
    z_s = jnp.where(vis, sz, BIG)

    n_surface = codes.shape[0]
    idx_bits = max(int(n_surface - 1).bit_length(), 1)
    z_bits = 31 - idx_bits
    assert z_bits >= 8, f"candidate count {n_surface} leaves {z_bits} bits"
    z_levels = float(2 ** z_bits)
    zmax = jnp.max(jnp.where(z_s < BIG / 2, z_s, 0.0))
    z_scale = (z_levels - 1.0) / jnp.maximum(zmax, 1e-3)
    zq = jnp.clip(z_s * z_scale, 0.0, z_levels - 1.0).astype(jnp.int32)
    idx32 = jax.lax.broadcasted_iota(jnp.int32, (n_surface,), 0)
    key = jnp.where(vis, (zq << idx_bits) | idx32, jnp.int32(2 ** 31 - 1))
    kbuf = jnp.full((H * W + 1,), jnp.int32(2 ** 31 - 1), jnp.int32)
    kbuf = kbuf.at[pix].min(key)
    kb = kbuf[:-1]
    if fill:
        kb2 = kb.reshape(H, W)
        empty = kb2 == 2 ** 31 - 1
        best = jnp.full_like(kb2, 2 ** 31 - 1)
        for dy_ in (-1, 0, 1):
            for dx_ in (-1, 0, 1):
                if dy_ == 0 and dx_ == 0:
                    continue
                best = jnp.minimum(best, jnp.roll(kb2, (dy_, dx_),
                                                  axis=(0, 1)))
        kb = jnp.where(empty, best, kb2).reshape(-1)
    have = kb != 2 ** 31 - 1
    widx = jnp.minimum(kb & (2 ** idx_bits - 1), n_surface - 1)
    won = codes[widx]                       # one gather; -1 marks empty
    vid = jnp.where(have & (won >= 0), won, -1)
    zbuf = jnp.where(have,
                     (kb >> idx_bits).astype(jnp.float32) / z_scale,
                     BIG)
    return zbuf, vid


def _gather_hist_rows(hist, vox_ids, K):
    """Per-voxel K-bin histogram rows from the row-native
    [NB, 2048*K/128, 128] layout (see ops/pallas/fuse_kernel.py).

    ONE fast 128-lane row gather (the voxel's K bins live inside row
    v // (128//K)) followed by a dense one-hot lane select. Measured at
    256^3 scale: ~35 ms for 307k pixels vs ~776 ms for the (1,1,K)-slice
    gather XLA emits from a vmapped dynamic_slice and ~150 ms for a
    retiling reshape (which also doubles peak HBM — OOM at 512^3).
    """
    vpk = 128 // K                       # voxels per hist row
    h2 = hist.reshape(-1, 128)           # leading-dim merge: layout-free
    flat_ids = vox_ids.reshape(-1)
    rows = h2[flat_ids // vpk].astype(jnp.float32)      # [P, 128]
    r4 = rows.reshape(rows.shape[0], vpk, K)
    oh = ((flat_ids % vpk)[:, None] == jnp.arange(vpk)[None, :])[..., None]
    out = jnp.sum(r4 * oh, axis=1)
    return out.reshape(vox_ids.shape + (K,))


def _fill_holes(zbuf2d, vid2d):
    """Close 1-px holes: empty pixels take the nearest-z neighbor among the
    8-neighborhood (9 dense shifted minimums)."""
    H, W = zbuf2d.shape
    best_z = zbuf2d
    best_v = vid2d
    empty = zbuf2d >= BIG
    fz = jnp.full_like(zbuf2d, BIG)
    fv = jnp.full_like(vid2d, -1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nz = jnp.roll(zbuf2d, (dy, dx), axis=(0, 1))
            nv = jnp.roll(vid2d, (dy, dx), axis=(0, 1))
            better = empty & (nz < fz)
            fz = jnp.where(better, nz, fz)
            fv = jnp.where(better, nv, fv)
    best_z = jnp.where(empty, fz, best_z)
    best_v = jnp.where(empty, fv, best_v)
    return best_z, best_v


@partial(jax.jit, static_argnames=("H", "W", "mode", "max_blocks",
                                   "max_surface", "max_rows", "shell_band",
                                   "fill", "nby", "nbz", "row_cap"))
def _splat_render_jit(diff, colorpk, hist, vol_start, voxel, M, m4,
                      H: int, W: int, nby: int, nbz: int,
                      mode: str = "instance", max_blocks: int = 4096,
                      max_surface: int = 512 * 1024, max_rows: int = 8192,
                      shell_band: float = 0.999, fill: bool = True,
                      row_cap: int = 0):
    zbuf, vid, _, _ = _splat_zbuffer_arrays(diff, vol_start, voxel, M, m4,
                                            H, W, nby, nbz, max_blocks,
                                            max_surface, max_rows,
                                            shell_band, row_cap,
                                            fill)  # key-space fill
    return _shade(zbuf.reshape(H, W), vid.reshape(H, W), colorpk, hist,
                  mode)


def fetch_shade_inputs(vd2, colorpk, hist, mode: str):
    """Per-pixel shade inputs of a winner-voxel image: (have, cpk, rows)
    with only the channel `mode` needs materialized (cpk for "color",
    hist rows for "instance"). Split out of _shade so the volume-sharded
    render can fetch shard-locally and psum-combine before decoding
    (parallel/sharding.make_sharded_render)."""
    have = vd2 >= 0
    vsafe = jnp.maximum(vd2, 0)
    cpk = rows = None
    if mode == "color":
        # gather 128-lane rows then one-hot-select the voxel's lane: a flat
        # [N_vox] view retiles; [N_vox/128, 128] is layout-free
        crows = colorpk.reshape(-1, 128)[vsafe // 128]
        oh = ((vsafe % 128)[..., None]
              == jnp.arange(128)[None, None, :]).astype(jnp.float32)
        cpk = jnp.sum(crows * oh, axis=-1)
    else:
        K = hist.shape[1] * 128 // 2048  # hist rows [NB, 2048*K/128, 128]
        rows = _gather_hist_rows(hist, vsafe, K)
    return have, cpk, rows


def shade_fetched(have, cpk, rows, mode: str):
    """Decode pre-fetched per-pixel shade inputs (fetch_shade_inputs) to
    the rendered u8 image — the shared tail of _shade and the sharded
    render's post-psum decode."""
    if mode == "color":
        blue = jnp.mod(cpk, 256.0)
        green = jnp.mod(jnp.floor(cpk / 256.0), 256.0)
        red = jnp.floor(cpk / 65536.0)
        img = jnp.stack([red, green, blue], -1)  # RGB out
        return jnp.where(have[..., None], img, 0.0).astype(jnp.uint8)
    H, W = have.shape
    K = rows.shape[-1]
    rows = rows.astype(jnp.float32)
    obj = jnp.argmax(rows, axis=-1)
    maxc = jnp.max(rows, axis=-1)
    lit = have & (obj > 0) & (maxc > 0)
    # palette lookup as a dense one-hot contraction: palette[obj] would be
    # ~130 ns/pixel scalar gathers (the same form that cost apply_relabel
    # ~40 ms/frame); the K-wide one-hot is a fused dense op
    pal = jnp.asarray(INSTANCE_PALETTE, jnp.int32)[:K]      # [K, 3]
    oh = (obj[..., None] == jnp.arange(K, dtype=jnp.int32))  # [H, W, K]
    img = jnp.einsum("hwk,kc->hwc", oh.astype(jnp.float32),
                     pal.astype(jnp.float32))
    img = jnp.where(lit[..., None], img, 0.0)
    return img.astype(jnp.uint8)


def _shade(zb2, vd2, colorpk, hist, mode: str):
    """Shade a decoded (z, winner-voxel) image pair: volume color or
    instance-argmax palette (viewer.cu:26-85 semantics)."""
    have, cpk, rows = fetch_shade_inputs(vd2, colorpk, hist, mode)
    return shade_fetched(have, cpk, rows, mode)


def _probe_decode(vid, hist, H: int, W: int, thresh: float):
    """Winner-voxel image -> (probs [H, W, K] raw counts, box_mask): the
    histogram fetch + threshold shared by every probe entry point."""
    vd2 = vid.reshape(H, W)
    have = vd2 >= 0
    vsafe = jnp.maximum(vd2, 0)
    K = hist.shape[1] * 128 // 2048
    rows = _gather_hist_rows(hist, vsafe, K).astype(jnp.float32)
    probs = jnp.where(have[..., None], rows, 0.0)
    box_mask = probs > thresh
    return probs, box_mask


def probe_from_rows(rows, hist, extrinsic2init, intrinsic, H: int, W: int,
                    cfg: FusionConfig):
    """Back-projection probe from a PRECOMPUTED compacted shell (see
    _compact_shell): the north-star streaming step computes the camera-free
    shell once per frame and shares it between this probe and the in-loop
    render. Returns (probs, box_mask, overflow, clip)."""
    M, m4 = pinhole_of_extrinsic(extrinsic2init, intrinsic)
    zbuf, vid, overflow, clip = _splat_from_rows(
        rows, M, m4, H, W, cfg.splat_max_blocks,
        getattr(cfg, "splat_max_rows", 8192), cfg.splat_max_surface,
        getattr(cfg, "splat_row_cap", 0), fill=True)
    probs, box_mask = _probe_decode(vid, hist, H, W, cfg.box_mask_thresh)
    return probs, box_mask, overflow, clip


@partial(jax.jit, static_argnames=("cfg", "H", "W", "max_blocks"))
def _splat_probe_jit(b, extrinsic2init, intrinsic, H: int, W: int,
                     cfg: FusionConfig, max_blocks: int = 4096):
    # (called from inside fusion_step_blocked traces or via the wrapper;
    # all leaves used -> not affected by the fastpath pruning bug)
    """Fast back-projection probe (the role of back_proj_kernel,
    tsdf.cu:72-135): per-pixel instance histogram at the fused surface seen
    from the sensor camera. Returns (probs [H, W, K] f32 raw counts,
    box_mask [H, W, K] bool) — nearest-voxel counts instead of trilinear
    interpolation (fast mode)."""
    M, m4 = pinhole_of_extrinsic(extrinsic2init, intrinsic)
    zbuf, vid, overflow, clip = splat_zbuffer(
        b, M, m4, H, W, cfg.splat_max_blocks, cfg.splat_max_surface,
        getattr(cfg, "splat_max_rows", 8192),
        getattr(cfg, "splat_shell_band", 0.999),
        getattr(cfg, "splat_row_cap", 0), fill=True)  # key-space fill
    probs, box_mask = _probe_decode(vid, b.hist, H, W, cfg.box_mask_thresh)
    return probs, box_mask, overflow, clip


def splat_render(b, M, m4, H, W, cfg, mode="instance", max_blocks=None,
                 fill=True):
    """Render the blocked volume from a pinhole (M, m4). Returns uint8
    [H, W, 3] RGB (instance palette or volume color).

    Thin non-jitted wrapper: calling the jitted callable directly from some
    call sites trips a jax-0.9 C++ fastpath bug ("Execution supplied 6
    buffers but compiled program expected 8") on repeat calls; the extra
    Python frame sidesteps it.
    """
    return _splat_render_jit(b.diff, b.colorpk, b.hist, b.vol_start,
                             b.voxel, M, m4, H, W, b.nby, b.nbz, mode=mode,
                             max_blocks=max_blocks or cfg.splat_max_blocks,
                             max_surface=cfg.splat_max_surface,
                             max_rows=getattr(cfg, "splat_max_rows", 8192),
                             shell_band=getattr(cfg, "splat_shell_band", 0.999),
                             fill=fill,
                             row_cap=getattr(cfg, "splat_row_cap", 0))


@partial(jax.jit, static_argnames=("H", "W", "mode", "max_blocks",
                                   "max_surface", "max_rows", "shell_band",
                                   "fill", "nby", "nbz", "row_cap"))
def _splat_render_orbit_jit(diff, colorpk, hist, vol_start, voxel, angle,
                            dist, intrinsic, H: int, W: int, nby: int,
                            nbz: int, mode: str = "instance",
                            max_blocks: int = 4096,
                            max_surface: int = 512 * 1024,
                            max_rows: int = 8192, shell_band: float = 0.999,
                            fill: bool = True, row_cap: int = 0):
    M, m4 = pinhole_of_orbit(angle, dist, intrinsic)
    return _splat_render_jit(diff, colorpk, hist, vol_start, voxel, M, m4,
                             H, W, nby, nbz, mode=mode,
                             max_blocks=max_blocks, max_surface=max_surface,
                             max_rows=max_rows, shell_band=shell_band,
                             fill=fill, row_cap=row_cap)


def splat_render_orbit(b, angle, dist, intrinsic, H, W, cfg,
                       mode="instance", fill=True):
    """Orbit render with the camera math INSIDE the jit: the eager
    pinhole_of_orbit would otherwise cost a relay round-trip per tiny op
    on a remote device link (~30 ms/frame of pure dispatch)."""
    return _splat_render_orbit_jit(
        b.diff, b.colorpk, b.hist, b.vol_start, b.voxel,
        jnp.asarray(angle, jnp.float32), jnp.asarray(dist, jnp.float32),
        jnp.asarray(intrinsic, jnp.float32), H, W, b.nby, b.nbz, mode=mode,
        max_blocks=cfg.splat_max_blocks, max_surface=cfg.splat_max_surface,
        max_rows=getattr(cfg, "splat_max_rows", 8192),
        shell_band=getattr(cfg, "splat_shell_band", 0.999), fill=fill,
        row_cap=getattr(cfg, "splat_row_cap", 0))


def splat_probe(b, extrinsic2init, intrinsic, H, W, cfg, max_blocks=None):
    """See _splat_probe_jit (same fastpath-bug wrapper as splat_render)."""
    return _splat_probe_jit(b, extrinsic2init, intrinsic, H, W, cfg,
                            max_blocks=max_blocks)


@partial(jax.jit, static_argnames=("nbx", "nby", "nbz", "H", "W",
                                   "stride"))
def _depth_probe_jit(depth, hist, vol_start, voxel, extrinsic2init,
                     intrinsic, nbx: int, nby: int, nbz: int,
                     H: int, W: int, thresh, depth_scale,
                     stride: int = 1):
    """Depth-direct probe: per-pixel voxel id straight from the sensor
    depth, no splat pass.

    The reference probe marches the stored TSDF to its zero crossing
    (``tsdf.cu:72-135``); in a static scene the crossing the fusion wrote
    sits AT the observed depth, so back-projecting the depth map lands on
    the same voxel (±1 — harmless, instance votes spread over the ±mu
    truncation band). This replaces the probe's entire projection +
    scatter-min pass (~15 ms at 512^3) with dense pixel math (~1 ms);
    the histogram fetch (_probe_decode) is shared. Trade: pixels with no
    depth return no votes, where the march could still hit stored
    surface — the same pixels the reference's depth-gated masks ignore
    (``dmask.py`` depth_filter). Enabled by cfg.probe_mode="depth".

    stride > 1 probes every stride-th pixel (association aggregates
    per-mask SUMS over thousands of pixels, so a 2x subsample preserves
    outcomes — asserted on the goldens in tests/test_splat.py — while
    cutting the histogram fetch 4x); probs/box_mask come back at the
    strided resolution, so pass the equally-strided masks to
    associate_instances."""
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (BLOCK_VOX, BX, BY,
                                                          BZ)
    d_m = depth[::stride, ::stride].astype(jnp.float32) / depth_scale
    Hs, Ws = d_m.shape
    Kinv = jnp.linalg.inv(jnp.asarray(intrinsic, jnp.float32)[:3, :3])
    u = (jnp.arange(Ws, dtype=jnp.float32) * stride)[None, :]
    v = (jnp.arange(Hs, dtype=jnp.float32) * stride)[:, None]
    # camera-space point at the observed depth (z = d, not ray length:
    # the pinhole projects s = K p with u = s_x / s_z — see
    # pinhole_of_extrinsic — so p = d * K^-1 [u, v, 1])
    cx = (Kinv[0, 0] * u + Kinv[0, 1] * v + Kinv[0, 2]) * d_m
    cy = (Kinv[1, 0] * u + Kinv[1, 1] * v + Kinv[1, 2]) * d_m
    cz = (Kinv[2, 2] + jnp.zeros_like(u)) * d_m
    E = jnp.asarray(extrinsic2init, jnp.float32)
    R, t = E[:3, :3], E[:3, 3]
    # init frame: p = R^T (c - t)
    px = R[0, 0] * (cx - t[0]) + R[1, 0] * (cy - t[1]) + R[2, 0] * (cz - t[2])
    py = R[0, 1] * (cx - t[0]) + R[1, 1] * (cy - t[1]) + R[2, 1] * (cz - t[2])
    pz = R[0, 2] * (cx - t[0]) + R[1, 2] * (cy - t[1]) + R[2, 2] * (cz - t[2])
    gx = jnp.round((px - vol_start[0]) / voxel[0]).astype(jnp.int32)
    gy = jnp.round((py - vol_start[1]) / voxel[1]).astype(jnp.int32)
    gz = jnp.round((pz - vol_start[2]) / voxel[2]).astype(jnp.int32)
    ok = ((d_m > 0)
          & (gx >= 0) & (gx < nbx * BX)
          & (gy >= 0) & (gy < nby * BY)
          & (gz >= 0) & (gz < nbz * BZ))
    gxs = jnp.clip(gx, 0, nbx * BX - 1)
    gys = jnp.clip(gy, 0, nby * BY - 1)
    gzs = jnp.clip(gz, 0, nbz * BZ - 1)
    blk = ((gxs // BX) * (nby * nbz) + (gys // BY) * nbz + (gzs // BZ))
    vlin = (gxs % BX) * (BY * BZ) + (gys % BY) * BZ + (gzs % BZ)
    vid = jnp.where(ok, blk * BLOCK_VOX + vlin, -1)
    probs, box_mask = _probe_decode(vid.reshape(-1), hist, Hs, Ws, thresh)
    zero = jnp.zeros((), jnp.int32)
    return probs, box_mask, zero, zero


def depth_probe(b, depth, extrinsic2init, intrinsic, H, W, cfg):
    """Probe-API twin of splat_probe fed by the live depth map (see
    _depth_probe_jit). Returns (probs, box_mask, overflow, clip) — the
    depth path has no budgets, so both counters are 0. With
    cfg.probe_stride > 1 the returned images are strided; callers must
    stride their masks to match (see probe_stride in FusionConfig)."""
    stride = getattr(cfg, "probe_stride", 1)
    return _depth_probe_jit(depth, b.hist, b.vol_start, b.voxel,
                            extrinsic2init, intrinsic, b.nbx, b.nby, b.nbz,
                            H, W, jnp.asarray(cfg.box_mask_thresh),
                            jnp.asarray(cfg.depth_scale, jnp.float32),
                            stride=stride)


@partial(jax.jit, static_argnames=("max_blocks", "max_rows", "shell_band",
                                   "nby", "nbz"))
def _precompute_shell_jit(diff, vol_start, voxel, nby: int, nbz: int,
                          max_blocks: int, max_rows: int,
                          shell_band: float):
    return _compact_shell(diff, vol_start, voxel, nby, nbz, max_blocks,
                          max_rows, shell_band)


@partial(jax.jit, static_argnames=("H", "W", "mode", "max_blocks",
                                   "max_surface", "max_rows", "row_cap"))
def _orbit_from_rows_jit(rows, colorpk, hist, angle, dist, intrinsic,
                         H: int, W: int, mode: str, max_blocks: int,
                         max_surface: int, max_rows: int, row_cap: int):
    M, m4 = pinhole_of_orbit(angle, dist, intrinsic)
    zbuf, vid, _, _ = _splat_from_rows(rows, M, m4, H, W, max_blocks,
                                       max_rows, max_surface, row_cap,
                                       fill=True)
    return _shade(zbuf.reshape(H, W), vid.reshape(H, W), colorpk, hist,
                  mode)


class OrbitRenderer:
    """Viewer-loop fast path. The reference fuses, then orbits the STATIC
    volume forever (``kernel.cpp:101-107``) — so the splat's state-side
    shell compaction (block/row nonzeros, row gathers, world positions)
    is computed ONCE here and every orbit frame pays only projection ->
    sort -> scatter -> shade.

    Usage::

        orb = OrbitRenderer(state, intrinsic, H, W, cfg)
        for k in range(n):
            img = orb.render(0.01 * k, dist)
    """

    def __init__(self, b, intrinsic, H: int, W: int, cfg,
                 mode: str = "instance"):
        self.H, self.W, self.mode, self.cfg = H, W, mode, cfg
        self.colorpk, self.hist = b.colorpk, b.hist
        self.intrinsic = jnp.asarray(intrinsic, jnp.float32)
        self.rows = _precompute_shell_jit(
            b.diff, b.vol_start, b.voxel, b.nby, b.nbz,
            cfg.splat_max_blocks, getattr(cfg, "splat_max_rows", 8192),
            getattr(cfg, "splat_shell_band", 0.999))

    def render(self, angle, dist, mode: str | None = None):
        return _orbit_from_rows_jit(
            self.rows, self.colorpk, self.hist,
            jnp.asarray(angle, jnp.float32), jnp.asarray(dist, jnp.float32),
            self.intrinsic, self.H, self.W, mode or self.mode,
            self.cfg.splat_max_blocks, self.cfg.splat_max_surface,
            getattr(self.cfg, "splat_max_rows", 8192),
            getattr(self.cfg, "splat_row_cap", 0))
