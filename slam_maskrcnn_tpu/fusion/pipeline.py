"""Semantic fusion pipeline — the ``TSDF::parse_frame`` equivalent.

Orchestrates probe -> associate -> relabel -> fuse as ONE jitted device
program per frame (the reference round-trips probs/box_mask to the host and
back every frame, ``src/SfM_CUDA/tsdf.cu:457-470``; we keep everything
device-resident, SURVEY §5.8).

Control flow parity with ``parse_frame``/``launch_kernel``
(``tsdf.cu:171-228, 418-488``):
* frame 0: initialize the volume from the depth bounding rect only — no
  fusion (the reference's recursive fuse call is commented out,
  ``tsdf.cu:213``).
* frame 1 (n_obs == 0): no association; num_objs = max(mask) + 1
  (``tsdf.cu:463-468``); fuse.
* frame 2+ (n_obs > 0): back-projection probe, Bayesian association,
  relabel the mask to global ids, fuse.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from slam_maskrcnn_tpu.fusion.associate import apply_relabel, associate_instances
from slam_maskrcnn_tpu.fusion.fuse import fuse_frame
from slam_maskrcnn_tpu.fusion.raycast import back_project_probe
from slam_maskrcnn_tpu.fusion.state import (FusionConfig, TSDFState,
                                            init_from_first_frame)


@partial(jax.jit, static_argnames=("cfg",))
def fusion_step(state: TSDFState, depth: jax.Array, color: jax.Array,
                mask: jax.Array, extrinsic2init: jax.Array,
                intrinsic: jax.Array, intrinsic_inv: jax.Array,
                cfg: FusionConfig):
    """One fused device step: (probe + associate + relabel) + fuse.

    Returns (new_state, relabeled_mask).
    """
    H, W = depth.shape

    def with_assoc(operand):
        st, msk = operand
        probs, bm = back_project_probe(st, extrinsic2init, intrinsic_inv,
                                       H, W, cfg)
        return associate_instances(probs, bm, msk, st.n_obs, st.num_objs, cfg)

    def first_fuse(operand):
        st, msk = operand
        identity = jnp.arange(cfg.max_objects, dtype=jnp.int32)
        return identity, jnp.max(msk).astype(jnp.int32) + 1

    relabel, num_objs = jax.lax.cond(state.n_obs > 0, with_assoc, first_fuse,
                                     (state, mask))
    mask_g = apply_relabel(mask, relabel)
    state = state.replace(num_objs=num_objs)
    state = fuse_frame(state, depth, color, mask_g, extrinsic2init,
                       intrinsic, cfg)
    return state, mask_g


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def fusion_step_blocked(state, depth: jax.Array, color: jax.Array,
                        mask: jax.Array, extrinsic2init: jax.Array,
                        intrinsic: jax.Array, cfg: FusionConfig):
    """Fast-path device step on the blocked state: Pallas fuse + splat
    probe. Same control flow as fusion_step; the probe uses nearest-voxel
    histogram counts (see fusion/splat.py) instead of trilinear samples.

    Returns (new_state, relabeled_mask, rect_misses).
    """
    return fusion_step_blocked_impl(state, depth, color, mask,
                                    extrinsic2init, intrinsic, cfg)


class SemanticFusion:
    """Host-side driver owning the functional state — the ergonomic
    equivalent of the reference's ``TSDF`` class + ``kernel.cpp`` glue."""

    def __init__(self, intrinsic: np.ndarray, cfg: FusionConfig | None = None,
                 backend: str = "xla", miss_check_every: int = 8,
                 on_miss=None):
        """backend: "xla" (exact trilinear probe, dense state) or "pallas"
        (blocked state, Pallas fuse kernel + splat probe — the fast path).

        miss_check_every: on the pallas backend, read back the kernel's
        rect-miss counter every N fused frames (a device->host sync, so not
        every frame). If misses were dropped, call ``on_miss(frame_idx,
        misses)`` if given, else ``warnings.warn`` — the caller's cue to
        re-run the sequence on the exact xla backend (the blocked state is
        too large to convert dense in-flight at 512^3). 0 disables."""
        assert backend in ("xla", "pallas")
        self.backend = backend
        self.miss_check_every = miss_check_every
        self.on_miss = on_miss
        self.total_misses = 0
        self._frame_idx = 0
        self.cfg = cfg or FusionConfig()
        self.intrinsic = np.asarray(intrinsic, np.float32)
        if self.intrinsic.shape == (3, 3):
            K = np.eye(4, dtype=np.float32)
            K[:3, :3] = self.intrinsic
            self.intrinsic = K
        self.intrinsic_inv = np.linalg.inv(self.intrinsic).astype(np.float32)
        self.state: TSDFState | None = None
        self.init_extrinsic_inv: np.ndarray | None = None
        self.mean_depth: float | None = None

    def parse_frame(self, depth: np.ndarray, color: np.ndarray,
                    mask: np.ndarray, extrinsic: np.ndarray,
                    mean_depth: float | None = None):
        """Feed one frame. Returns the relabeled (global-id) mask for frames
        that fuse, else None (frame 0 only initializes, as the reference)."""
        if mean_depth is None:
            valid = depth > 0
            mean_depth = float(
                (depth[valid].astype(np.float64) / self.cfg.depth_scale).mean())
        if self.state is None:
            if self.backend == "pallas":
                from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
                    init_blocked_from_first_frame)
                self.state = init_blocked_from_first_frame(
                    self.cfg, np.asarray(depth), self.intrinsic, mean_depth)
            else:
                self.state = init_from_first_frame(
                    self.cfg, np.asarray(depth), self.intrinsic, mean_depth)
            self.init_extrinsic_inv = np.linalg.inv(
                np.asarray(extrinsic, np.float64)).astype(np.float32)
            self.mean_depth = mean_depth
            return None
        e2i = (np.asarray(extrinsic, np.float32)
               @ self.init_extrinsic_inv).astype(np.float32)
        if self.backend == "pallas":
            self.state, mask_g, misses = fusion_step_blocked(
                self.state, jnp.asarray(depth), jnp.asarray(color),
                jnp.asarray(mask), jnp.asarray(e2i),
                jnp.asarray(self.intrinsic), self.cfg)
            self.last_misses = misses
            self._frame_idx += 1
            if (self.miss_check_every
                    and self._frame_idx % self.miss_check_every == 0):
                m = int(misses)  # sync point, every Nth frame only
                if m > 0:
                    self.total_misses += m
                    if self.on_miss is not None:
                        self.on_miss(self._frame_idx, m)
                    else:
                        import warnings
                        warnings.warn(
                            f"pallas fuse dropped {m} voxels at frame "
                            f"{self._frame_idx}; re-run on backend='xla' "
                            "for exact results")
            return mask_g
        self.state, mask_g = fusion_step(
            self.state, jnp.asarray(depth), jnp.asarray(color),
            jnp.asarray(mask), jnp.asarray(e2i),
            jnp.asarray(self.intrinsic), jnp.asarray(self.intrinsic_inv),
            self.cfg)
        return mask_g

    def dense_state(self):
        """The volume as a dense TSDFState regardless of backend."""
        if self.backend == "pallas":
            from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import to_dense
            return to_dense(self.state, self.cfg)
        return self.state


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def fuse_sequence_blocked(state, depths: jax.Array, colors: jax.Array,
                          masks: jax.Array, extrinsics2init: jax.Array,
                          intrinsic: jax.Array, cfg: FusionConfig):
    """Blocked-state (Pallas fast-path) analog of :func:`fuse_sequence`:
    one ``lax.scan`` over a pre-staged frame stack — one device dispatch
    for the whole chunk. This is the throughput path for ``≤100`` frame
    runs (the reference's workload, ``src/SfM_CUDA/kernel.cpp:74``): the
    per-call dispatch cost (30-60 ms through a remote relay) amortizes
    over the chunk. State buffers are donated — at 512^3 the blocked
    state is ~9.5 GiB and an undonated scan would double peak HBM.

    Returns (final_state, relabeled_masks [N, H, W], misses [N])."""

    def step(st, frame):
        depth, color, mask, e2i = frame
        st, mask_g, miss = fusion_step_blocked_impl(
            st, depth, color, mask, e2i, intrinsic, cfg)
        return st, (mask_g, miss)

    state, (masks_g, misses) = jax.lax.scan(
        step, state, (depths, colors, masks, extrinsics2init))
    return state, masks_g, misses


def fusion_step_blocked_impl(state, depth, color, mask, extrinsic2init,
                             intrinsic, cfg: FusionConfig):
    """Unjitted body of :func:`fusion_step_blocked` (scan-able)."""
    from slam_maskrcnn_tpu.fusion.splat import depth_probe, splat_probe
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        fuse_frame_blocked_impl)

    H, W = depth.shape

    def with_assoc(operand):
        st, msk = operand
        if cfg.probe_mode == "depth":
            probs, bm, ovf, _clip = depth_probe(st, depth, extrinsic2init,
                                                intrinsic, H, W, cfg)
            s = getattr(cfg, "probe_stride", 1)
            msk = msk[::s, ::s]
        else:
            probs, bm, ovf, _clip = splat_probe(st, extrinsic2init,
                                                intrinsic, H, W, cfg)
        rl, no = associate_instances(probs, bm, msk, st.n_obs, st.num_objs,
                                     cfg)
        return rl, no, ovf

    def first_fuse(operand):
        st, msk = operand
        identity = jnp.arange(cfg.max_objects, dtype=jnp.int32)
        return (identity, jnp.max(msk).astype(jnp.int32) + 1,
                jnp.zeros((), jnp.int32))

    relabel, num_objs, overflow = jax.lax.cond(state.n_obs > 0, with_assoc,
                                               first_fuse, (state, mask))
    mask_g = apply_relabel(mask, relabel)
    state = state.replace(num_objs=num_objs)
    state, misses = fuse_frame_blocked_impl(state, depth, color, mask_g,
                                            extrinsic2init, intrinsic, cfg)
    return state, mask_g, misses + overflow


def fusion_step_pair_blocked_impl(state, d1, c1, m1, e1, d2, c2, m2, e2,
                                  intrinsic, cfg: FusionConfig,
                                  prep=None):
    """Two-frame fusion step (the paired-kernel throughput form).

    `prep` (optional): both frames' pair_prep_static outputs — the
    state-independent kernel prep (banded tables sans mask bits,
    origins, pass-B flags, camera params), precomputed BATCHED over a
    whole chunk by the north-star driver so the scan body only injects
    the relabeled masks (PERFORMANCE.md r5).

    BOTH frames' associations probe the PRE-pair histogram — frame 2's
    votes are one frame stale vs the reference's strictly sequential
    probe-after-every-fuse (``src/SfM_CUDA/kernel.cpp:76-99``). The
    per-mask vote aggregates span thousands of pixels, so one frame of
    staleness flips association outcomes only while an object's
    evidence is still thin; num_objs chains through frame 1 so fresh
    ids never collide. Given the two relabeled masks, the paired kernel
    (``ops/pallas/fuse_kernel.py fuse_frames2_blocked_impl``) is
    BIT-EXACT vs two sequential single-frame kernels — the pairing
    approximation lives entirely in this association ordering
    (tests/test_fuse_pair.py quantifies both statements).

    Callers should warm the volume with >= 1 sequential frame first: at
    n_obs == 0 frame 2 would associate against an empty histogram and
    fresh-id every mask a second time.

    Returns (new_state, (mask_g1, mask_g2), misses)."""
    from slam_maskrcnn_tpu.fusion.splat import depth_probe, splat_probe
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        fuse_frames2_blocked_impl)

    H, W = d1.shape
    s = getattr(cfg, "probe_stride", 1)

    def probe(st, depth, e2i):
        if cfg.probe_mode == "depth":
            return depth_probe(st, depth, e2i, intrinsic, H, W, cfg)
        return splat_probe(st, e2i, intrinsic, H, W, cfg)

    def with_assoc1(operand):
        st, msk = operand
        probs, bm, ovf, _clip = probe(st, d1, e1)
        if cfg.probe_mode == "depth":
            msk = msk[::s, ::s]
        rl, no = associate_instances(probs, bm, msk, st.n_obs,
                                     st.num_objs, cfg)
        return rl, no, ovf

    def first_fuse1(operand):
        st, msk = operand
        identity = jnp.arange(cfg.max_objects, dtype=jnp.int32)
        return (identity, jnp.max(msk).astype(jnp.int32) + 1,
                jnp.zeros((), jnp.int32))

    relabel1, num1, ovf1 = jax.lax.cond(state.n_obs > 0, with_assoc1,
                                        first_fuse1, (state, m1))
    mask_g1 = apply_relabel(m1, relabel1)

    # frame 2: same (pre-pair) histogram, num_objs chained through 1
    probs2, bm2, ovf2, _clip2 = probe(state, d2, e2)
    m2s = m2[::s, ::s] if cfg.probe_mode == "depth" else m2
    if getattr(cfg, "pair_probe_boost", True):
        # inject frame 1's would-be votes (see FusionConfig
        # .pair_probe_boost): where both frames observe the same surface
        # at a pixel (adjacent frames; |d1 - d2| <= mu), frame 1's fuse
        # would have deposited one vote for mask_g1's id at the voxel
        # frame 2 probes — add that vote and its box-mask bit. Dense
        # one-hot only (a reprojection would cost ~2 ms of scalar
        # gathers per frame; association aggregates per-mask log-means
        # over thousands of pixels, so pixel-level parallax is noise).
        s2 = s if cfg.probe_mode == "depth" else 1
        g1 = mask_g1[::s2, ::s2].astype(jnp.int32)
        d1s = d1[::s2, ::s2].astype(jnp.float32) / cfg.depth_scale
        d2s = d2[::s2, ::s2].astype(jnp.float32) / cfg.depth_scale
        near = (d1s > 0) & (d2s > 0) & (jnp.abs(d1s - d2s) <= state.mu)
        oh = ((g1[..., None] == jnp.arange(cfg.max_objects,
                                           dtype=jnp.int32))
              & near[..., None])
        probs2 = probs2 + oh.astype(probs2.dtype)
        bm2 = bm2 | oh
    relabel2, num2 = associate_instances(probs2, bm2, m2s,
                                         state.n_obs + 1, num1, cfg)
    mask_g2 = apply_relabel(m2, relabel2)

    state = state.replace(num_objs=num2)
    if prep is not None:
        from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
            fuse_frames2_blocked_prepped, inject_mask_banded)
        (T1p, o1, ff1, p1), (T2p, o2, ff2, p2) = prep
        state, misses = fuse_frames2_blocked_prepped(
            state, (inject_mask_banded(T1p, mask_g1), o1, ff1, p1),
            (inject_mask_banded(T2p, mask_g2), o2, ff2, p2), H, W, cfg)
    else:
        state, misses = fuse_frames2_blocked_impl(
            state, d1, c1, mask_g1, e1, d2, c2, mask_g2, e2, intrinsic,
            cfg)
    return state, (mask_g1, mask_g2), misses + ovf1 + ovf2


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def fuse_pair_sequence_blocked(state, depths, colors, masks,
                               extrinsics2init, intrinsic,
                               cfg: FusionConfig):
    """Paired analog of :func:`fuse_sequence_blocked`: one scan step per
    TWO frames (N must be even). Warm the state with >= 1 sequential
    frame first (see fusion_step_pair_blocked_impl). State buffers are
    donated (9.5 GiB at 512^3 — see fuse_sequence_blocked). Returns
    (final_state, relabeled_masks [N, H, W], misses [N//2])."""
    N = depths.shape[0]
    assert N % 2 == 0, f"paired scan needs an even frame count, got {N}"

    def pairify(x):
        return x.reshape((N // 2, 2) + x.shape[1:])

    def step(st, frame):
        d, c, m, e = frame
        st, (g1, g2), miss = fusion_step_pair_blocked_impl(
            st, d[0], c[0], m[0], e[0], d[1], c[1], m[1], e[1],
            intrinsic, cfg)
        return st, (jnp.stack([g1, g2]), miss)

    state, (masks_g, misses) = jax.lax.scan(
        step, state, (pairify(depths), pairify(colors), pairify(masks),
                      pairify(extrinsics2init)))
    return (state, masks_g.reshape((N,) + masks_g.shape[2:]), misses)


@partial(jax.jit, static_argnames=("cfg",))
def fuse_sequence(state: TSDFState, depths: jax.Array, colors: jax.Array,
                  masks: jax.Array, extrinsics2init: jax.Array,
                  intrinsic: jax.Array, intrinsic_inv: jax.Array,
                  cfg: FusionConfig):
    """Fuse a whole pre-staged frame stack with one ``lax.scan`` — the
    throughput path (no per-frame dispatch overhead). Frames are [N, ...]
    device arrays; returns (final_state, relabeled_masks [N, H, W])."""

    def step(st, frame):
        depth, color, mask, e2i = frame
        st, mask_g = fusion_step(st, depth, color, mask, e2i,
                                 intrinsic, intrinsic_inv, cfg)
        return st, mask_g

    return jax.lax.scan(step, state, (depths, colors, masks, extrinsics2init))
