"""TSDF volume state — a functional pytree, the core data structure of stage 2.

Re-designs the mutable CUDA ``TSDF`` class (reference:
``src/SfM_CUDA/tsdf.cuh:7-67``, ``src/SfM_CUDA/tsdf.cu:137-280``) as an
immutable JAX pytree so the fusion step is ``state' = fuse(state, frame)``,
jit- and scan-able over frames and shardable over a device mesh.

Semantics preserved from the reference (each is a deliberate parity choice):

* The volume is axis-aligned in the *first camera's* frame; its bounding box
  is derived from the first depth frame's nonzero-pixel bounding rectangle,
  back-projected at the mean depth, with the half-side equal to half the
  rect diagonal (``tsdf.cu:173-214``).
* ``voxel = (vol_end - vol_start) / (dim - 1)`` and ``mu = 5 * voxel.x``
  (``tsdf.cu:197-199``).
* The SDF buffer is initialized to **+mu in metric units** while subsequent
  updates store the **normalized** truncated diff in [-1, 1]
  (``tsdf.cu:202-205`` vs ``tsdf.cu:49-56``). This mixed convention is a
  reference quirk reproduced deliberately: weight starts at 0, so the first
  valid observation fully overwrites the init value; only never-observed
  voxels keep +mu.
* Per-voxel instance histogram of width ``max_objects`` (= MAX_OBJECTS 32,
  ``tsdf.cuh:4``) counting mask-id observations (``tsdf.cu:61``).
* Color stored as uint8 with integer-truncating running average
  (``tsdf.cu:59``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Static fusion configuration.

    Mirrors the reference's three config tiers (class ``Configuration`` at
    ``src/SfM_CUDA/configuration.h:2-9`` plus compile-time constants at
    ``src/SfM_CUDA/tsdf.cuh:4,52``) as one frozen dataclass.
    """

    vol_dim: tuple[int, int, int] = (256, 256, 256)
    max_objects: int = 32  # MAX_OBJECTS, tsdf.cuh:4
    # Bayesian association priors, configuration.h:8-9
    prior_mrcnn_err_rate: float = 0.05
    duplicate_thresh: float = 0.5
    # mu multiplier: truncation band = mu_factor * voxel.x, tsdf.cu:199
    mu_factor: float = 5.0
    # TUM depth scale: raw uint16 / depth_scale = meters, tsdf.cu:49
    depth_scale: float = 5000.0
    # Gate on normalized diff below which color/histogram update, tsdf.cu:57
    color_diff_gate: float = 0.99
    # probs threshold for box_mask in the back-projection probe, tsdf.cu:128
    box_mask_thresh: float = 0.3
    # Histogram dtype: uint32 matches reference (tsdf.cu:249); uint16 halves
    # HBM at 512^3 (see SURVEY §5.7). Counts are bounded by frames fused.
    hist_dtype: jnp.dtype = jnp.uint32
    # Ray march safety cap (reference marches until tfar; we bound the
    # while_loop). diagonal/min-step with slack.
    max_march_steps: int = 4096
    # Pallas fuse kernel: per-block image rect (h, w). Must bound the
    # projected footprint of one (8, 8, 32)-voxel block; the kernel reports
    # a miss count when exceeded (fall back to the XLA path then).
    # h is DMA-sublane-aligned (multiple of 8); w needs footprint + 128
    # lane-alignment slack and must be a multiple of 128.
    # (96, 256) + near_block_budget 256 measured fastest at 256^3 with
    # zero misses (the rect scales the per-voxel lookup work; oversized
    # footprints route to the full-image pass B)
    # pass-A rect window (v, u) for the "gather" lookup orientation. The
    # per-block lookup cost is ~linear in rect_h, so this stays SMALL and
    # blocks whose in-image footprint exceeds it escalate to the mid rect
    # (pallas_rect_mid, compacted pass M) and then to a full-image pass B
    # — instead of every block paying the worst case (was (96, 256)
    # before the cascade; (64, 256) measured faster end to end)
    pallas_rect: tuple = (64, 256)
    # escalation tiers: mid-rect window and its compacted-block budget
    pallas_rect_mid: tuple = (192, 384)
    mid_block_budget: int = 2048
    # rect for the transposed "gather_t" lookup: (sublanes over u with
    # 8-alignment slack, lanes over v with 128 slack) — the u footprint
    # must fit rect_t[0] - 8, the v footprint 128
    pallas_rect_t: tuple = (64, 256)
    # Pallas rect-lookup scheme: "gather" / "gather_t" (per-sublane-row
    # tpu.dynamic_gather + one-hot contraction — zero MXU work, exact f32
    # passthrough; _t uses a transposed table with a smaller rect) or
    # "matmul" (int8 one-hot MXU matmul over 8-bit planes). All bit-exact;
    # gather measured 4x faster (the matmul's wide int32 output dominated
    # VPU time). See ops/pallas/fuse_kernel.py.
    pallas_lookup: str = "gather"
    # In-kernel uniform-block classification: blocks whose footprint depth
    # bounds prove every voxel is in free space (dn == 1) take a
    # closed-form update with no per-voxel rect lookup; blocks entirely
    # behind the surface take the identity. Bit-exact by construction
    # (conservative f32 bounds); False disables for A/B timing. See
    # ops/pallas/fuse_kernel.py.
    pallas_uniform_skip: bool = True
    # XLA-side pre-classification (the 512^3 DMA lever): the same
    # free/behind bounds evaluated BEFORE the kernel launch from a
    # 32x32-pooled depth min/max pyramid + per-block corner camera-z
    # bounds. Pre-classified blocks skip their rect AND histogram DMAs
    # entirely (the hist DMA alone is ~128 KB/block); the in-kernel
    # check (pallas_uniform_skip) still catches blocks the conservative
    # pooled bounds miss. Bit-exact (strictly conservative in f32 with a
    # 0.1 mm camera-z slack). See ops/pallas/fuse_kernel.py.
    pallas_preclass: bool = True
    # Sparse main pass (the 512^3 grid lever): with pre-classification on,
    # MOST blocks are identity (invisible/behind — 82% at the 512^3 bench
    # scene) — yet the dense grid still streams every block's
    # diff/color/weight through VMEM and pays NB/GROUP grid steps
    # (measured: 12.8 ms of a 31.6 ms frame with ZERO visible blocks).
    # Sparse mode gathers only the non-identity blocks (full-lookup +
    # closed-form free) into one compacted pass — histogram kept in HBM
    # via gated true-id DMA — and never touches identity blocks. Blocks
    # beyond vis_block_budget count into the miss channel (whole blocks),
    # the same contract as the escalation budgets. Best at >= 512^3;
    # at 256^3 the dense grid is only ~512 steps and the gather/nonzero
    # overhead roughly cancels the win. See ops/pallas/fuse_kernel.py.
    pallas_sparse: bool = False
    vis_block_budget: int = 16384
    # Compacted STREAMED main grid (the round-4 512^3 grid lever): the
    # dense grid pays its ~13 ms zero-visible floor streaming + visiting
    # every block even though 82% are pre-classified identity, while
    # pallas_sparse's alternatives pay either a 16 ms XLA gather/scatter
    # or per-block manual state DMA waits. Compact mode instead drives
    # the BlockSpec index_map itself from a scalar-prefetched list of
    # non-identity block RUNS (pallas_compact_grp consecutive blocks):
    # the grid has one step per listed run, the pipeline streams ONLY
    # those runs (in ascending id order), and identity runs are never
    # streamed, visited, or written (input/output aliasing keeps their
    # bytes). Padding steps (budget > live runs) point at an all-identity
    # run, whose code-0 slots commit the identity — exact in both
    # compiled and interpret modes. Bit-exact vs the dense grid by
    # construction (same kernel body, same per-block codes); runs beyond
    # vis_block_budget blocks count into the miss channel. Mutually
    # exclusive with pallas_sparse (sparse wins if both set).
    pallas_compact: bool = False
    # Blocks per compacted run: 1 maximizes skipping (only non-identity
    # blocks stream) but pays one grid step per block; larger runs
    # amortize per-step pipeline cost over G streamed blocks. NB must be
    # divisible by it.
    pallas_compact_grp: int = 8
    # Blocks per DENSE grid step (the main pass's inner fori length):
    # larger groups amortize per-grid-step pipeline cost over more
    # blocks at the price of bigger hist staging scratch (~256 KB/block
    # at K=32 u16). Clamped down to a divisor of NB.
    pallas_group: int = 16
    # Banded rect table ("gather" lookup only): the two packed frame
    # tables (depth+mask, color) interleave in 8-row bands inside ONE
    # [2H, W] table, so each visible block issues ONE rect DMA instead
    # of two. Bit-exact, and measured NEUTRAL at 512^3 (29.9 vs 29.8 ms)
    # — which pins the fuse kernel's 11.6 ms rect-DMA cost to the number
    # of strided ROWS copied (~15 ns/row x 96 rows x 8k blocks), not to
    # DMA start/wait count (this halved it) nor landing latency
    # (pipeline depth 3 was neutral too). Kept as the measurement's
    # executable record; the row-count lever is a group-shared rect.
    pallas_banded_rect: bool = False
    # Frame table resident in VMEM ("gather" lookup): the banded packed
    # table is ~2.4-2.9 MB at 480x640 — it fits VMEM whole. One DMA per
    # PASS loads it; every visible block then reads its rect window as a
    # dynamic-offset vector load (Mosaic supports tile-aligned dynamic
    # starts on both dims at the same cost as static reads — measured)
    # instead of a per-block HBM rect DMA. Kills the fuse kernel's
    # ~11.6 ms/frame strided-row DMA cost at 512^3 (the round-3 closing
    # ablation's residual). Bit-exact: identical window semantics. Falls
    # back to per-block DMAs when the padded table exceeds ~12 MB or for
    # the full-image pass B (whose window would blow the vreg budget).
    pallas_frame_vmem: bool = True
    # Per-ROW dynamic-window lookup tier (frame_vmem only): each of the
    # 16 sublane rows of a visible block reads its OWN 16-logical-row
    # banded window at a dynamic 8-aligned offset, so the gather chain
    # processes 32 banded rows per sublane invocation regardless of the
    # block's total v-extent (the static tiers pay 64 rows at (32,128)
    # and 96 at (48,128)). Dispatched when every sublane row's
    # ok-footprint fits its aligned window AND the lanes fit one 128
    # chunk; fits are the COMMON case (a sublane row spans half an
    # x-slab — a few projected pixels). Bit-exact: same ok set, same
    # values, same update math (tests/test_fuse_pallas.py).
    pallas_rowdyn: bool = False
    # Approximate candidate selection at render refreshes: replace the
    # [max_rows, 128] 2-operand minor-dim z-sort inside
    # splat.select_candidates with lax.approx_min_k (recall 0.95) + a
    # dense one-hot code pickup. Per row, up to ~5% of the true
    # nearest-cap set may swap for slightly farther candidates — the
    # same z-order-redundant class the row cap already clips; dropped
    # pixels still z-test exactly at render time. Bounded by the winner
    # agreement A/B (PERFORMANCE.md r5); off by default (the exact sort
    # is the reference-faithful selection).
    splat_select_approx: bool = False
    # Hist-update group skip: the in-kernel histogram vote moves
    # [2048*K/128, 128] of data per gated block (16x the voxel tile)
    # regardless of how FEW voxels gate; with this on, the rows split
    # into 4 groups (4 source sublane-rows each) and groups whose
    # voxels never gate are skipped (scalar any-reduce + pl.when).
    # Bit-exact: skipped groups' rows receive no votes by definition
    # (r5e attribution: the hist update is 4.4 ms/frame of the paired
    # 512^3 step — the largest single visible-work item).
    pallas_hist_gskip: bool = False
    # Deferred write-backs: the HBM-resident histogram (and, in
    # state_hbm mode, state) write-backs used to start+wait INLINE per
    # block — full DMA latency exposed in the compute path, ~1 us per
    # gated block. Deferring each wait to the slot's next reuse (the
    # prefetch for the block NSLOT steps later, ~16 blocks of compute
    # away) hides it; in-flight writes are tracked per (kind, slot,
    # lane) in SMEM flags and drained at reuse or in a final-step
    # epilogue. Bit-exact (ordering only). False = the old inline waits.
    pallas_defer_writeback: bool = True
    # State (diff/colorpk/weight) HBM-resident with true-id manual DMA —
    # the same scheme the histogram already uses; bytes move only for
    # non-identity blocks (free: diff+weight; full: all three). Measured:
    # on the DENSE grid it is ~3 ms SLOWER at 512^3 (per-block commit
    # waits lose to BlockSpec's pipelined streaming, and the zero-visible
    # floor turned out to be fori-loop visit overhead, not streaming) —
    # its win is inside the SPARSE compacted pass, where it replaces a
    # 16 ms XLA gather/scatter of block state with ~0. Pair it with
    # pallas_sparse.
    pallas_state_hbm: bool = False
    # Compacted VISITS on the dense streamed grid (the round-4 floor
    # lever): the dense grid's fori loop pays an SMEM-read+branch visit
    # for every block (~100 ns each — the measured ~13 ms zero-visible
    # floor at 512^3, PERFORMANCE.md round 3b) although 82% are
    # pre-classified identity. With this on, XLA appends per-group
    # non-identity lane counts + front-packed lane lists to the scalar
    # prefetch operand (one lane-merged minor-dim sort, the splat's
    # compaction trick); each grid step commits the whole group's state
    # with three vector copies (identity for all) and then visits ONLY
    # the listed lanes. Bit-exact by construction: visited lanes run the
    # identical update bodies and overwrite their lane of the bulk copy.
    # Requires state streamed (not pallas_state_hbm), NB % 128 == 0 and
    # pallas_group an even divisor of 128 — silently falls back to dense
    # visits otherwise. Unlike pallas_compact (which shrinks the GRID
    # and lost its win to per-step pipeline cost), the grid/streaming
    # pipeline here is untouched; only the scalar-core visit loop
    # compacts. MEASURED SLOWER at the 512^3 bench scene (27.15 vs
    # 25.33 ms/frame, r4e): the identity visits the r3b floor analysis
    # blamed (~100 ns SMEM-read+branch each) are NOT the dense grid's
    # remaining cost — zero-visible floor probes (PERFORMANCE.md r4e)
    # pin the floor to per-step streaming/pipeline structure. Kept
    # (tested, bit-exact) as the measurement's executable record.
    pallas_visit_compact: bool = False
    # measurement-only: named pieces of the fuse kernel's visible-block
    # update body replaced by pass-throughs ("hist", "color", "blend") so
    # their cost can be read off a live A/B. WRONG MATH when non-empty;
    # never set in production configs (see _fuse_kernel's ablate arg).
    pallas_ablate: tuple = ()
    # splat probe/renderer compaction budgets: blocks holding surface, and
    # visible surface voxels kept for the z-buffer scatters. Scatter cost
    # scales with these STATIC sizes (measured 256^3 step: 326 ms at
    # (4096, 512k) vs 170 ms at these defaults); exceeding them is counted
    # into the step's miss/overflow channel, so raise them when that fires
    splat_max_blocks: int = 2048
    splat_max_surface: int = 256 * 1024
    # 128-lane rows holding visible surface kept by the splat's level-1
    # compaction (nonzero's bincount scatter scales with its INPUT size;
    # compacting rows first shrinks the voxel-level nonzero input from
    # max_blocks*2048 to max_rows*128 — see fusion/splat.py)
    splat_max_rows: int = 16384
    # surface shell thickness (normalized SDF band (-band, 0)) kept by the
    # splat. 0.999 = the full first-negative band; thinner bands punch
    # probe holes at grazing surfaces (projective TSDF, see splat.py)
    splat_shell_band: float = 0.999
    # > 0 enables the splat's sort-based level-2 compaction keeping this
    # many z-nearest visible voxels per 128-lane row (replaces a ~15 ms
    # nonzero with a ~5 ms lane sort at the 256^3 budgets — measured
    # 55 -> 34 ms/frame for the full fusion step). 0 = exact nonzero
    # compaction; None (default) resolves to 24 for fine volumes
    # (>= 256^3) and 0 for coarse ones, where shell thickness in voxel
    # units can exceed any per-row cap. The packed-key scatter-min is the
    # splat wall and scales with max_rows*cap (cap sweep, 512^3 scene:
    # 48 -> 25.6 ms, 24 -> 15.7 ms at winner-agreement 0.9998 with only
    # z-order-redundant entries clipped; 16 -> 12.8 ms but agreement
    # drops to 0.970). Clipped entries are counted into the separate
    # `clip` channel, NOT the miss channel. See fusion/splat.py.
    splat_row_cap: int | None = None
    # association probe source: "splat" projects the stored surface shell
    # (a full scatter-min pass, ~15 ms at 512^3 — semantics closest to
    # the reference's TSDF march, tsdf.cu:72-135); "depth" back-projects
    # the live depth map straight to voxel ids (~1 ms dense math, no
    # budgets) — in a static scene the fused zero crossing sits at the
    # observed depth, so both read the same ±mu histogram band. The
    # histogram fetch and association are identical. See
    # fusion/splat.py:_depth_probe_jit.
    probe_mode: str = "splat"
    # depth-probe pixel stride: association aggregates per-mask sums over
    # thousands of pixels, so probing every 2nd pixel preserves outcomes
    # (asserted on goldens) while cutting the histogram fetch + the
    # association matmuls 4x. Only the depth probe honors it.
    probe_stride: int = 1
    # North-star chunk: recompact the render's surface shell every N
    # frames instead of every frame (the ~7 ms _compact_shell pass feeds
    # ONLY the in-loop render when probe_mode="depth"; shading still
    # reads the CURRENT color/histogram through the carried voxel ids, so
    # staleness is confined to shell geometry — the same trade the
    # share_shell=True step already makes for one frame). 1 = every frame.
    shell_refresh_every: int = 1
    # Paired-frame fusion: the pair-SECOND frame's association probes the
    # pre-pair histogram (one frame stale — fusion/pipeline.py
    # fusion_step_pair_blocked_impl). With the boost on, the pair-FIRST
    # frame's relabeled mask is injected into the second probe as a
    # depth-gated one-hot vote (same pixel, |d1 - d2| <= mu) — a dense
    # zero-gather proxy for the votes frame 1's fuse would have deposited
    # at the probed surface voxels. Fixes the thin-evidence failure mode
    # (an object FIRST seen at a pair's first frame would otherwise
    # fresh-id again at its second; tests/test_fuse_pair.py).
    pair_probe_boost: bool = True

    def __post_init__(self):
        if self.splat_row_cap is None:
            object.__setattr__(self, "splat_row_cap",
                               24 if min(self.vol_dim) >= 256 else 0)
    # fuse pass B budget: blocks whose projected footprint exceeds the
    # rect (very-near-camera or camera-plane-straddling blocks) are fused
    # in a second full-image-rect pass over a compacted subset of at most
    # this many blocks; overflow is counted into `misses`
    near_block_budget: int = 256
    # "majority-vote" single-id mode of the TSDF_Python prototype
    # (src/TSDF_Python/tsdf.cu:48-57): Boyer-Moore count instead of the full
    # histogram — 1/max_objects the memory. Optional compatibility mode.
    majority_vote: bool = False

    @property
    def n_voxels(self) -> int:
        dx, dy, dz = self.vol_dim
        return dx * dy * dz


class TSDFState(struct.PyTreeNode):
    """The fused volume + association bookkeeping. A pytree of arrays.

    Buffers correspond 1:1 to the reference's device arrays
    (``tsdf.cuh:25-33``), reshaped [X, Y, Z(, C)] instead of flat — the
    reference's flat index is ``dim.y*dim.z*x + dim.z*y + z``
    (``tsdf.cu:55``), i.e. C-order [X, Y, Z].
    """

    diff: jax.Array      # f32 [X, Y, Z]    SDF (init +mu metric; updates normalized)
    color: jax.Array     # u8  [X, Y, Z, 3] running-average color (BGR as loaded)
    weight: jax.Array    # i32 [X, Y, Z]    observation count per voxel
    hist: jax.Array      # uint [X, Y, Z, K] instance-id observation histogram
    vol_start: jax.Array  # f32 [3] AABB min corner (first-camera frame)
    vol_end: jax.Array    # f32 [3] AABB max corner
    voxel: jax.Array      # f32 [3] voxel pitch per axis
    mu: jax.Array         # f32 [] truncation band (metric)
    n_obs: jax.Array      # i32 [] frames fused so far (n_obs_, tsdf.cuh:50)
    num_objs: jax.Array   # i32 [] global instance-id high-water mark (+1)
    # majority-vote mode only (zeros-shaped (1,1,1) placeholders otherwise):
    mv_id: jax.Array      # i32 [X, Y, Z] current majority instance id
    mv_cnt: jax.Array     # i32 [X, Y, Z] Boyer-Moore counter


def init_state(cfg: FusionConfig, vol_start, vol_end, num_objs=0) -> TSDFState:
    """Allocate an empty volume over the AABB [vol_start, vol_end].

    Mirrors ``TSDF::init_cuda_vars`` + the host-side init
    (``tsdf.cu:197-214, 230-253``).
    """
    dim = cfg.vol_dim
    vol_start = jnp.asarray(vol_start, jnp.float32)
    vol_end = jnp.asarray(vol_end, jnp.float32)
    voxel = (vol_end - vol_start) / (jnp.asarray(dim, jnp.float32) - 1.0)
    mu = cfg.mu_factor * voxel[0]
    if cfg.majority_vote:
        hist = jnp.zeros((1, 1, 1, 1), cfg.hist_dtype)
        mv_id = jnp.zeros(dim, jnp.int32)
        mv_cnt = jnp.zeros(dim, jnp.int32)
    else:
        hist = jnp.zeros(dim + (cfg.max_objects,), cfg.hist_dtype)
        mv_id = jnp.zeros((1, 1, 1), jnp.int32)
        mv_cnt = jnp.zeros((1, 1, 1), jnp.int32)
    return TSDFState(
        diff=jnp.full(dim, mu, jnp.float32),
        color=jnp.zeros(dim + (3,), jnp.uint8),
        weight=jnp.zeros(dim, jnp.int32),
        hist=hist,
        vol_start=vol_start,
        vol_end=vol_end,
        voxel=voxel,
        mu=mu,
        n_obs=jnp.zeros((), jnp.int32),
        num_objs=jnp.asarray(num_objs, jnp.int32),
        mv_id=mv_id,
        mv_cnt=mv_cnt,
    )


def volume_bbox_from_depth(depth: np.ndarray, intrinsic: np.ndarray,
                           mean_depth: float) -> tuple[np.ndarray, np.ndarray]:
    """Volume AABB from the first frame's depth image.

    Reference semantics (``tsdf.cu:177-196``): bounding rect of nonzero
    depth pixels; back-project the rect's top-left and bottom-right corners
    (exclusive br, as cv::Rect::br()) through K^-1 at ``mean_depth``; volume
    is the cube centered at their midpoint with half-side = half the 2D
    (x, y) diagonal of the back-projected corners. Note the corners are
    scaled by the *metric* mean depth — the /5000 depth scaling happened in
    ``mean_depth`` itself (``utils.cu:87``).

    Host-side (runs once per sequence): numpy in, numpy out.
    """
    ys, xs = np.nonzero(depth)
    if len(xs) == 0:
        raise ValueError("first depth frame has no valid (nonzero) pixels")
    # cv::boundingRect: tl inclusive, br exclusive
    tlx, tly = float(xs.min()), float(ys.min())
    brx, bry = float(xs.max() + 1), float(ys.max() + 1)
    K_inv = np.linalg.inv(np.asarray(intrinsic, np.float64))
    tl = K_inv[:3, :3] @ np.array([tlx, tly, 1.0]) * mean_depth
    br = K_inv[:3, :3] @ np.array([brx, bry, 1.0]) * mean_depth
    half_side = float(np.hypot(tl[0] - br[0], tl[1] - br[1]) / 2.0)
    center = (tl + br) / 2.0
    vol_start = (center - half_side).astype(np.float32)
    vol_end = (center + half_side).astype(np.float32)
    return vol_start, vol_end


def init_from_first_frame(cfg: FusionConfig, depth: np.ndarray,
                          intrinsic: np.ndarray, mean_depth: float,
                          num_objs: int = 0) -> TSDFState:
    """First-frame lazy init, = the ``!init_`` branch of ``parse_frame``
    (``tsdf.cu:173-214``). The first frame only *initializes* — the
    reference's recursive fuse call is commented out (``tsdf.cu:213``), so
    fusion starts with the second frame. ``SemanticFusion`` preserves that.
    """
    vol_start, vol_end = volume_bbox_from_depth(depth, intrinsic, mean_depth)
    return init_state(cfg, vol_start, vol_end, num_objs=num_objs)


def make_intrinsic(fx: float, fy: float, cx: float, cy: float) -> np.ndarray:
    """4x4 intrinsic matrix as the reference builds it (``tsdf.cu:137-147``)."""
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy
    return K
