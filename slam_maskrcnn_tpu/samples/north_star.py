"""The north-star configuration as ONE device program per frame:

    detect (Mask R-CNN 1024^2) -> device label-encode -> 512^3 blocked
    Pallas fuse (probe + associate + relabel + fuse) -> splat render

BASELINE.md's headline target is this exact composition at >= 30 fps on
one v5e chip — the reference driver's fuse-then-view process
(``src/SfM_CUDA/kernel.cpp:64-107``: imread/mask -> ``parse_frame`` ->
``Viewer::show_tsdf``), with the two offline stages joined live and the
render inside the loop (the reference renders after fusing; a live system
renders per frame).

Design notes (TPU):
* The whole frame is one jit (or one ``lax.scan`` chunk): detect, mask
  post-processing, probe, association, fusion and render never leave the
  device; only the raw [H, W, 3] uint8 frame goes up and (optionally) the
  rendered [H, W, 3] uint8 comes back.
* Image molding happens on device (``resize_image``'s square mode,
  ``Mask_RCNN/mrcnn/utils.py:392-497``) — static geometry per sensor size.
* The splat's camera-free shell compaction (fusion/splat.py
  ``_compact_shell``) is computed ONCE per frame and shared between the
  back-projection probe and the render (``share_shell=True``): the render
  then reuses the pre-fuse shell with post-fuse color/histogram (one frame
  of shell staleness, invisible at sensor frame-to-frame motion), paying
  only projection + sort + scatter + shade. ``share_shell=False``
  recompacts after fusing — the bitwise-fresh render for fidelity tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from slam_maskrcnn_tpu.fusion.associate import (apply_relabel,
                                                associate_instances)
from slam_maskrcnn_tpu.fusion.splat import (_compact_shell, _shade,
                                            _splat_from_rows,
                                            decode_candidates, depth_probe,
                                            pinhole_of_orbit,
                                            probe_from_rows,
                                            select_candidates,
                                            splat_from_candidates)
from slam_maskrcnn_tpu.fusion.state import FusionConfig
from slam_maskrcnn_tpu.models.anchors import get_anchors
from slam_maskrcnn_tpu.models.mask_ops import label_masks_device
from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (fuse_frame_blocked_impl,
                                                      pair_prep_static,
                                                      pair_prepable)


def device_mold_geometry(model_config, H: int, W: int):
    """Static molding geometry for a fixed sensor size (mirrors
    ``resize_image``'s square and rect modes, utils.py:392-497 and
    models/mask_rcnn.py resize_image, and LivePipeline's device molding).
    Returns (rh, rw, top, left, mh, mw, nwin [1,4])."""
    mode = model_config.IMAGE_RESIZE_MODE
    assert mode in ("square", "rect"), \
        "device molding implements the square and rect resize modes"
    if mode == "rect":
        mh, mw = (int(s) for s in model_config.IMAGE_RECT_SHAPE)
        scale = min(mh / H, mw / W)
        if model_config.IMAGE_MIN_SCALE:
            scale = max(scale, model_config.IMAGE_MIN_SCALE)
    else:
        mh = mw = int(model_config.IMAGE_MAX_DIM)
        scale = max(1.0, model_config.IMAGE_MIN_DIM / min(H, W))
        if model_config.IMAGE_MIN_SCALE:
            scale = max(scale, model_config.IMAGE_MIN_SCALE)
        if round(max(H, W) * scale) > model_config.IMAGE_MAX_DIM:
            scale = model_config.IMAGE_MAX_DIM / max(H, W)
    rh, rw = round(H * scale), round(W * scale)
    top, left = (mh - rh) // 2, (mw - rw) // 2
    win_px = np.array([top, left, top + rh, left + rw], np.float32)
    den = np.array([mh - 1, mw - 1, mh - 1, mw - 1], np.float32)
    shift = np.array([0, 0, 1, 1], np.float32)
    nwin = ((win_px - shift) / den)[None]
    return rh, rw, top, left, mh, mw, nwin


def detect_mask_impl(model, params, anchors, nwin, color_bgr,
                     H: int, W: int, geom, mean_pixel):
    """Device molding + Mask R-CNN + label-encode for ONE frame: the
    detect side of the north-star step (stage 1 of the reference,
    ``mask_process.py:97-105`` + ``dmask.py:47-59``, fused on device)."""
    rh, rw, top, left, mh, mw = geom
    rgb = color_bgr[..., ::-1].astype(jnp.float32)
    img = jax.image.resize(rgb, (rh, rw, 3), method="bilinear")
    img = jnp.pad(img, ((top, mh - rh - top), (left, mw - rw - left),
                        (0, 0)))
    molded = (img - jnp.asarray(mean_pixel, jnp.float32))[None]
    out = model.module.apply(params, molded, anchors, nwin)
    return label_masks_device(out["detections"][0], out["masks"][0],
                              nwin[0], (H, W), min_area=2000)


def detect_mask_batched_impl(model, params, anchors, nwin, colors_bgr,
                             H: int, W: int, geom, mean_pixel):
    """Batched twin of detect_mask_impl over a frame stack [N, H, W, 3].

    One model apply at batch N amortizes the proposal stage's serialized
    small-op schedule floor (~20 ms/dispatch regardless of batch,
    PERFORMANCE.md "the ~20 ms schedule floor") across the chunk — the
    backbone/heads math is batch-linear on the MXU, so per-frame detect
    cost approaches (floor/N + compute)."""
    rh, rw, top, left, mh, mw = geom
    N = colors_bgr.shape[0]
    rgb = colors_bgr[..., ::-1].astype(jnp.float32)
    img = jax.vmap(lambda f: jax.image.resize(f, (rh, rw, 3),
                                              method="bilinear"))(rgb)
    img = jnp.pad(img, ((0, 0), (top, mh - rh - top),
                        (left, mw - rw - left), (0, 0)))
    molded = img - jnp.asarray(mean_pixel, jnp.float32)
    nwin_n = jnp.broadcast_to(nwin, (N, 4))
    out = model.module.apply(params, molded, anchors, nwin_n)
    return jax.vmap(
        lambda d, m: label_masks_device(d, m, nwin[0], (H, W),
                                        min_area=2000))(out["detections"],
                                                        out["masks"])


def fuse_render_step_impl(state, mask, depth, color_bgr, e2i, intrinsic,
                          angle, dist, cfg: FusionConfig, H: int, W: int,
                          share_shell: bool = True,
                          render_mode: str = "instance", rows=None,
                          cands=None, cands_dec=None):
    """Fusion side of the north-star frame, detect already done: probe ->
    associate -> relabel -> 512^3 blocked fuse -> in-loop splat render.

    `cands` (optional, depth-probe mode): a carried candidate code set
    (fusion/splat.py select_candidates) — the chunk scan refreshes it
    every cfg.shell_refresh_every frames and the render re-projects the
    codes EXACTLY with this frame's camera, skipping the full shell
    projection + sort. `rows` (optional): a precomputed compacted shell
    for the splat-probe path. Shading always reads the CURRENT
    color/histogram through the voxel ids; staleness is confined to
    candidate selection geometry.

    Returns (new_state, render [H, W, 3] u8, mask_g [H, W], misses)."""
    # ---- shell compaction once, shared probe <-> render ----
    if rows is None and cands is None:
        rows = _compact_shell(state.diff, state.vol_start, state.voxel,
                              state.nby, state.nbz, cfg.splat_max_blocks,
                              cfg.splat_max_rows, cfg.splat_shell_band)

    def with_assoc(operand):
        st, msk = operand
        if cfg.probe_mode == "depth":
            probs, bm, ovf, _clip = depth_probe(st, depth, e2i, intrinsic,
                                                H, W, cfg)
            s = getattr(cfg, "probe_stride", 1)
            msk = msk[::s, ::s]
        else:
            probs, bm, ovf, _clip = probe_from_rows(rows, st.hist, e2i,
                                                    intrinsic, H, W, cfg)
        rl, no = associate_instances(probs, bm, msk, st.n_obs, st.num_objs,
                                     cfg)
        return rl, no, ovf

    def first_fuse(operand):
        st, msk = operand
        identity = jnp.arange(cfg.max_objects, dtype=jnp.int32)
        return (identity, jnp.max(msk).astype(jnp.int32) + 1,
                jnp.zeros((), jnp.int32))

    relabel, num_objs, overflow = jax.lax.cond(
        state.n_obs > 0, with_assoc, first_fuse, (state, mask))
    mask_g = apply_relabel(mask, relabel)
    state = state.replace(num_objs=num_objs)
    state, misses = fuse_frame_blocked_impl(state, depth, color_bgr, mask_g,
                                            e2i, intrinsic, cfg)

    if render_mode == "none":
        # measurement mode: everything but the in-loop render (candidate
        # refresh, probe, association and fuse all still run) — the
        # composed-chunk A/B that isolates the render's true cost inside
        # the one-jit frame (isolated stage timings carry ~3.5 ms of
        # relay dispatch each, PERFORMANCE.md)
        return (state, jnp.zeros((H, W, 3), jnp.uint8), mask_g,
                misses + overflow)

    render = _render_view(state, angle, dist, intrinsic, cfg, H, W,
                          share_shell, render_mode, rows, cands, cands_dec)
    return state, render, mask_g, misses + overflow


def _render_view(state, angle, dist, intrinsic, cfg: FusionConfig,
                 H: int, W: int, share_shell: bool, render_mode: str,
                 rows, cands, cands_dec=None):
    """The in-loop render (viewer.cu orbit camera): candidate/shell splat
    + shade at one orbit angle, reading the CURRENT state."""
    M, m4 = pinhole_of_orbit(angle, dist, intrinsic)
    if cands is not None:
        zbuf, vid = splat_from_candidates(cands, state.vol_start,
                                          state.voxel, state.nby,
                                          state.nbz, M, m4, H, W,
                                          fill=True, decoded=cands_dec)
    else:
        if not share_shell or rows is None:
            rows = _compact_shell(state.diff, state.vol_start, state.voxel,
                                  state.nby, state.nbz,
                                  cfg.splat_max_blocks,
                                  cfg.splat_max_rows, cfg.splat_shell_band)
        zbuf, vid, _, _ = _splat_from_rows(rows, M, m4, H, W,
                                           cfg.splat_max_blocks,
                                           cfg.splat_max_rows,
                                           cfg.splat_max_surface,
                                           cfg.splat_row_cap, fill=True)
    if render_mode == "splatonly":
        # measurement mode: splat without shading — the headline-vs-this
        # delta is the _shade cost inside the composed frame
        return jnp.broadcast_to(
            (vid.reshape(H, W, 1) % 255).astype(jnp.uint8), (H, W, 3))
    return _shade(zbuf.reshape(H, W), vid.reshape(H, W),
                  state.colorpk, state.hist, render_mode)


def fuse_render_pair_step_impl(state, m1, d1, c1, e1, a1, m2, d2, c2, e2,
                               a2, intrinsic, dist, cfg: FusionConfig,
                               H: int, W: int, share_shell: bool = True,
                               render_mode: str = "instance", cands=None,
                               cands_dec=None, prep=None):
    """Paired-frame north-star step: both frames' associations, ONE
    paired fuse kernel pass (fusion/pipeline.py
    fusion_step_pair_blocked_impl — the dense pass's per-frame fixed
    costs paid once per pair), then BOTH frames' in-loop renders from
    the post-pair state. Two approximations vs the sequential step,
    both bounded by tests/test_fuse_pair.py / test_north_star.py:
    frame 2's association probes the pre-pair histogram (one frame
    stale), and frame 1's render sees frame 2's fused data (one frame
    ahead). Requires a warmed state (n_obs >= 1) and
    probe_mode="depth" (the pair step carries no shared shell).

    Returns (new_state, renders [2, H, W, 3] u8, masks_g [2, H, W],
    misses)."""
    from slam_maskrcnn_tpu.fusion.pipeline import (
        fusion_step_pair_blocked_impl)

    state, (mg1, mg2), misses = fusion_step_pair_blocked_impl(
        state, d1, c1, m1, e1, d2, c2, m2, e2, intrinsic, cfg, prep=prep)
    if render_mode == "none":
        z = jnp.zeros((2, H, W, 3), jnp.uint8)
        return state, z, jnp.stack([mg1, mg2]), misses
    r1 = _render_view(state, a1, dist, intrinsic, cfg, H, W,
                      share_shell, render_mode, None, cands, cands_dec)
    r2 = _render_view(state, a2, dist, intrinsic, cfg, H, W,
                      share_shell, render_mode, None, cands, cands_dec)
    return state, jnp.stack([r1, r2]), jnp.stack([mg1, mg2]), misses


def north_star_step_impl(model, params, anchors, nwin, state,
                         depth, color_bgr, e2i, intrinsic, angle, dist,
                         cfg: FusionConfig, H: int, W: int,
                         geom, mean_pixel,
                         share_shell: bool = True,
                         render_mode: str = "instance", cands=None):
    """One full north-star frame (scan-able, all static shapes).

    Returns (new_state, render [H, W, 3] u8, mask_g [H, W], misses)."""
    mask = detect_mask_impl(model, params, anchors, nwin, color_bgr,
                            H, W, geom, mean_pixel)
    return fuse_render_step_impl(state, mask, depth, color_bgr, e2i,
                                 intrinsic, angle, dist, cfg, H, W,
                                 share_shell, render_mode, cands=cands)


class NorthStar:
    """Driver owning the jitted per-frame step and the scan chunk form.

    Per-frame inputs are (depth u16/f32 [H, W], color BGR u8 [H, W, 3],
    extrinsic2init f32 [4, 4], angle, dist); outputs are the rendered
    frame and the relabeled global-id mask, both device-resident."""

    def __init__(self, model, intrinsic, cfg: FusionConfig, H: int, W: int,
                 share_shell: bool = True, render_mode: str = "instance"):
        self.model, self.cfg, self.H, self.W = model, cfg, H, W
        geom_all = device_mold_geometry(model.config, H, W)
        self.geom = tuple(geom_all[:6])
        self.nwin = jnp.asarray(geom_all[6])
        mh, mw = self.geom[4], self.geom[5]
        self.anchors = jnp.asarray(get_anchors(model.config, (mh, mw, 3)))
        self.intrinsic = jnp.asarray(intrinsic, jnp.float32)
        self.mean_pixel = np.asarray(model.config.MEAN_PIXEL, np.float32)
        step = partial(north_star_step_impl, model, cfg=cfg, H=H, W=W,
                       geom=self.geom, mean_pixel=self.mean_pixel,
                       share_shell=share_shell, render_mode=render_mode)
        self._step = jax.jit(
            lambda params, anchors, nwin, state, d, c, e, K, a, s:
            step(params, anchors, nwin, state, d, c, e, K, a, s),
            donate_argnums=(3,))
        # per-call twin taking a carried candidate set (see step())
        self._step_cands = jax.jit(
            lambda params, anchors, nwin, state, d, c, e, K, a, s, cn:
            step(params, anchors, nwin, state, d, c, e, K, a, s,
                 cands=cn),
            donate_argnums=(3,))
        from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import _block_dims
        nbx, nby, nbz = _block_dims(cfg.vol_dim)

        @jax.jit
        def _refresh_cands(diff, vol_start, voxel, angle, dist):
            rows = _compact_shell(diff, vol_start, voxel, nby, nbz,
                                  cfg.splat_max_blocks, cfg.splat_max_rows,
                                  cfg.splat_shell_band)
            M, m4 = pinhole_of_orbit(angle, dist, self.intrinsic)
            codes, ovf, _clip = select_candidates(
                rows, M, m4, cfg.splat_row_cap,
                approx=getattr(cfg, "splat_select_approx", False))
            return codes, ovf

        self._refresh_cands = _refresh_cands
        self._cands = None
        self._cands_ovf = None
        self._step_i = 0

        # shell_refresh_every > 1: the scan carries the render's
        # CANDIDATE code set (splat.select_candidates — one i32 array)
        # and refreshes it every N frames: the shell compaction AND the
        # [max_rows, 128] projection + sort are skipped on carry frames;
        # the codes are re-projected exactly with each frame's camera.
        # Valid only with probe_mode="depth" (the shell feeds ONLY the
        # render there); shading always reads current color/histogram.
        refresh = max(1, int(getattr(cfg, "shell_refresh_every", 1)))
        if refresh > 1:
            assert cfg.probe_mode == "depth", \
                "shell_refresh_every > 1 would stale the splat probe; " \
                "use probe_mode='depth'"

        def _candidates(st, angle, dist):
            # returns (codes, overflow): overflow is HARD loss (shell
            # block/row budget exceeded before selection) and feeds the
            # refresh frame's miss channel — the no-silent-caps
            # convention. `clip` (row-cap'd z-order-redundant entries) is
            # discarded here like the probe paths discard theirs; it is
            # quantified by the cap-agreement sweeps (PERFORMANCE.md).
            rows = _compact_shell(st.diff, st.vol_start, st.voxel,
                                  st.nby, st.nbz, cfg.splat_max_blocks,
                                  cfg.splat_max_rows, cfg.splat_shell_band)
            M, m4 = pinhole_of_orbit(angle, dist, self.intrinsic)
            codes, ovf, _clip = select_candidates(
                rows, M, m4, cfg.splat_row_cap,
                approx=getattr(cfg, "splat_select_approx", False))
            return codes, ovf

        def _scan_fused(state, depths, colors, es, K4, angles, dist,
                        masks=None, detect_ctx=None):
            """Common fuse+render scan with the optional carried-shell
            refresh schedule. `masks` given: scan over precomputed masks
            (the batched-detect form); None: detect inside the loop using
            detect_ctx = (params, anchors, nwin)."""
            def fuse_one(st, d, c, msk, e, a, cands=None, cands_dec=None):
                if msk is None:
                    params, anchors, nwin = detect_ctx
                    msk = detect_mask_impl(model, params, anchors, nwin,
                                           c, H, W, self.geom,
                                           self.mean_pixel)
                return fuse_render_step_impl(
                    st, msk, d, c, e, K4, a, dist, cfg, H, W,
                    share_shell, render_mode, cands=cands,
                    cands_dec=cands_dec)

            xs = ((depths, colors, es, angles) if masks is None
                  else (depths, colors, masks, es, angles))

            def unpack(fr):
                if masks is None:
                    d, c, e, a = fr
                    return d, c, None, e, a
                d, c, msk, e, a = fr
                return d, c, msk, e, a

            if refresh <= 1:
                def body(st, fr):
                    st, render, mask_g, miss = fuse_one(st, *unpack(fr))
                    return st, (render, mask_g, miss)

                return jax.lax.scan(body, state, xs)

            N = depths.shape[0]
            if N % refresh == 0:
                # refresh-aligned NESTED scan: the outer scan walks
                # segments of `refresh` frames, computing AND DECODING the
                # candidate set once per segment; the inner scan closes
                # over it as a loop-INVARIANT. Same schedule and bitwise
                # outputs as the carried-cond form below (refresh at
                # i % refresh == 0 from the post-previous-frame state at
                # that frame's angle), but the ~1M-entry candidate decode
                # is provably hoisted instead of re-derived per frame —
                # the carried lax.cond form defeated XLA's loop-invariant
                # hoisting (r4: composed render 14.0 ms vs ~7.5 isolated).
                n_seg = N // refresh
                seg_xs = tuple(x.reshape((n_seg, refresh) + x.shape[1:])
                               for x in xs)

                def seg_body(st, seg):
                    a0 = seg[-1][0]  # segment's first orbit angle
                    cands, ovf = _candidates(st, a0, dist)
                    dec = decode_candidates(cands, st.vol_start, st.voxel,
                                            st.nby, st.nbz)

                    def body(st, fr):
                        st, render, mask_g, miss = fuse_one(
                            st, *unpack(fr), cands=cands, cands_dec=dec)
                        return st, (render, mask_g, miss)

                    st, (renders, mgs, misses) = jax.lax.scan(body, st,
                                                              seg)
                    # the segment's refresh overflow lands on its first
                    # frame (the no-silent-caps channel)
                    return st, (renders, mgs, misses.at[0].add(ovf))

                state, (renders, mgs, misses) = jax.lax.scan(seg_body,
                                                             state, seg_xs)
                return state, (
                    renders.reshape((N,) + renders.shape[2:]),
                    mgs.reshape((N,) + mgs.shape[2:]),
                    misses.reshape(-1))

            cands0, cands_ovf0 = _candidates(state, angles[0], dist)
            idxs = jnp.arange(depths.shape[0], dtype=jnp.int32)

            def body(carry, fr_i):
                st, cands = carry
                fr, i = fr_i[:-1], fr_i[-1]
                a = fr[-1]  # this frame's orbit angle
                cands, cands_ovf = jax.lax.cond(
                    (i % refresh == 0) & (i > 0),
                    lambda s: _candidates(s, a, dist),
                    lambda _s: (cands, jnp.zeros((), jnp.int32)), st)
                # frame 0's refresh overflow lands on frame 0
                cands_ovf = jnp.where(i == 0, cands_ovf0, cands_ovf)
                st, render, mask_g, miss = fuse_one(st, *unpack(fr),
                                                    cands=cands)
                return (st, cands), (render, mask_g, miss + cands_ovf)

            (state, _), outs = jax.lax.scan(body, (state, cands0),
                                            xs + (idxs,))
            return state, outs

        def chunk(params, anchors, nwin, state, depths, colors, es, K4,
                  angles, dist):
            # detect stays INSIDE the scan: the per-frame-latency form
            state, (renders, masks_g, misses) = _scan_fused(
                state, depths, colors, es, K4, angles, dist,
                detect_ctx=(params, anchors, nwin))
            return state, renders, masks_g, misses

        self._chunk = jax.jit(chunk, donate_argnums=(3,))

        def chunk_batched(params, anchors, nwin, state, depths, colors, es,
                          K4, angles, dist):
            # detect ALL chunk frames in ONE batched model apply (detect
            # has no dependence on the fusion state, so hoisting it out of
            # the scan is semantics-preserving), then scan the state-
            # dependent fuse+render over the precomputed masks
            masks = detect_mask_batched_impl(model, params, anchors,
                                             nwin, colors, H, W,
                                             self.geom, self.mean_pixel)
            state, (renders, masks_g, misses) = _scan_fused(
                state, depths, colors, es, K4, angles, dist, masks=masks)
            return state, renders, masks_g, misses

        self._chunk_batched = jax.jit(chunk_batched, donate_argnums=(3,))

        def _scan_pair(state, depths, colors, masks, es, K4, angles, dist,
                       preps=None):
            """Paired-frame fuse+render scan (N/2 steps over frame
            pairs): the dense fuse pass's per-frame fixed costs are paid
            once per pair (fuse_render_pair_step_impl). Carries the same
            candidate-refresh schedule as _scan_fused, evaluated at the
            pair's first frame. `preps` (optional): the chunk's batched
            pair_prep_static outputs [N, ...] — the scan body then only
            injects relabeled masks instead of re-running the
            state-independent kernel prep per frame."""
            N = depths.shape[0]

            def pairify(x):
                return x.reshape((N // 2, 2) + x.shape[1:])

            xs = tuple(pairify(v) for v in (depths, colors, masks, es,
                                            angles))
            n_fr = 5
            if preps is not None:
                xs = xs + tuple(pairify(p) for p in preps)

            def pair_step(st, fr, cands=None, cands_dec=None):
                d, c, m, e, a = fr[:n_fr]
                prep = None
                if preps is not None:
                    T, o, ff, pp = fr[n_fr:]
                    prep = ((T[0], o[0], ff[0], pp[0]),
                            (T[1], o[1], ff[1], pp[1]))
                return fuse_render_pair_step_impl(
                    st, m[0], d[0], c[0], e[0], a[0],
                    m[1], d[1], c[1], e[1], a[1], K4, dist, cfg, H, W,
                    share_shell, render_mode, cands=cands,
                    cands_dec=cands_dec, prep=prep)

            # pairs per refresh segment: the carried-cond form refreshes
            # at pair i when (2i) % refresh == 0
            seg_pairs = refresh if refresh % 2 else refresh // 2
            if refresh <= 1:
                def body(st, fr):
                    st, renders, mg, miss = pair_step(st, fr)
                    return st, (renders, mg, miss)

                state, (renders, mgs, misses) = jax.lax.scan(body, state,
                                                             xs)
            elif (N // 2) % seg_pairs == 0:
                # refresh-aligned nested scan over PAIR segments — see
                # _scan_fused: candidate select + decode once per
                # segment, closed over the inner scan as invariants
                n_seg = (N // 2) // seg_pairs
                seg_xs = tuple(x.reshape((n_seg, seg_pairs) + x.shape[1:])
                               for x in xs)

                def seg_body(st, seg):
                    a0 = seg[4][0, 0]  # segment's first orbit angle
                    cands, ovf = _candidates(st, a0, dist)
                    dec = decode_candidates(cands, st.vol_start, st.voxel,
                                            st.nby, st.nbz)

                    def body(st, fr):
                        st, renders, mg, miss = pair_step(
                            st, fr, cands=cands, cands_dec=dec)
                        return st, (renders, mg, miss)

                    st, (renders, mgs, misses) = jax.lax.scan(body, st,
                                                              seg)
                    return st, (renders, mgs, misses.at[0].add(ovf))

                state, (renders, mgs, misses) = jax.lax.scan(seg_body,
                                                             state, seg_xs)
                NP = N // 2
                renders = renders.reshape((NP,) + renders.shape[2:])
                mgs = mgs.reshape((NP,) + mgs.shape[2:])
                misses = misses.reshape(-1)
            else:
                cands0, ovf0 = _candidates(state, angles[0], dist)
                idxs = jnp.arange(N // 2, dtype=jnp.int32)

                def body(carry, fr_i):
                    st, cands = carry
                    fr, i = fr_i[:-1], fr_i[-1]
                    a0 = fr[4][0]  # the pair's first orbit angle
                    cands, ovf = jax.lax.cond(
                        ((2 * i) % refresh == 0) & (i > 0),
                        lambda s: _candidates(s, a0, dist),
                        lambda _s: (cands, jnp.zeros((), jnp.int32)), st)
                    ovf = jnp.where(i == 0, ovf0, ovf)
                    st, renders, mg, miss = pair_step(st, fr, cands=cands)
                    return (st, cands), (renders, mg, miss + ovf)

                (state, _), (renders, mgs, misses) = jax.lax.scan(
                    body, (state, cands0), xs + (idxs,))
            return (state, renders.reshape((N,) + renders.shape[2:]),
                    mgs.reshape((N,) + mgs.shape[2:]), misses)

        def chunk_batched_pair(params, anchors, nwin, state, depths,
                               colors, es, K4, angles, dist):
            masks = detect_mask_batched_impl(model, params, anchors,
                                             nwin, colors, H, W,
                                             self.geom, self.mean_pixel)
            # hoist the state-independent kernel prep out of the scan as
            # ONE vmapped dispatch over the chunk (pair_prep_static reads
            # only volume geometry; serial in-scan it cost ~2.9 ms/frame
            # of latency-bound small ops, PERFORMANCE.md r5)
            preps = None
            if pair_prepable(cfg, H, W):
                preps = jax.vmap(
                    lambda d, c, e: pair_prep_static(state, d, c, e, K4,
                                                     cfg))(depths, colors,
                                                           es)
            return _scan_pair(state, depths, colors, masks, es, K4,
                              angles, dist, preps=preps)

        self._chunk_batched_pair = jax.jit(chunk_batched_pair,
                                           donate_argnums=(3,))

    def step(self, state, depth, color_bgr, e2i, angle, dist):
        """One live frame. With cfg.shell_refresh_every > 1 (depth-probe
        mode), the render's candidate set is cached host-side and
        refreshed every N calls — the same amortization the chunk scan
        carries in its state. Call reset_candidates() after swapping to
        an unrelated volume."""
        args = (state, jnp.asarray(depth), jnp.asarray(color_bgr),
                jnp.asarray(e2i), self.intrinsic,
                jnp.asarray(angle, jnp.float32),
                jnp.asarray(dist, jnp.float32))
        refresh = max(1, int(getattr(self.cfg, "shell_refresh_every", 1)))
        if refresh > 1:
            if self._cands is None or self._step_i % refresh == 0:
                self._cands, self._cands_ovf = self._refresh_cands(
                    state.diff, state.vol_start, state.voxel,
                    args[5], args[6])
            self._step_i += 1
            st, render, mask_g, miss = self._step_cands(
                self.model.params, self.anchors, self.nwin, *args,
                self._cands)
            # surface the cached candidate set's hard overflow (shell
            # budget loss) into this frame's miss channel
            return st, render, mask_g, miss + self._cands_ovf
        return self._step(self.model.params, self.anchors, self.nwin,
                          *args)

    def reset_candidates(self):
        """Drop the per-call candidate cache (e.g. after re-initializing
        the volume)."""
        self._cands = None
        self._cands_ovf = None
        self._step_i = 0

    def run_chunk(self, state, depths, colors, es, angles, dist):
        """One dispatch for a whole pre-staged frame stack ([N, ...]):
        the throughput form (per-call dispatch costs 30-60 ms through a
        remote relay). Returns (state, renders [N,H,W,3] u8, masks_g,
        misses [N]) — all device-resident."""
        return self._chunk(self.model.params, self.anchors, self.nwin,
                           state, depths, colors, es, self.intrinsic,
                           angles, jnp.asarray(dist, jnp.float32))

    def run_chunk_batched(self, state, depths, colors, es, angles, dist):
        """run_chunk with detect hoisted out of the scan as ONE batched
        model apply over the chunk's N frames (see
        detect_mask_batched_impl): near-identical outputs (XLA's batch-N
        conv lowering can flip a few mask border pixels vs batch-1 —
        bounded in tests/test_north_star.py), and the detect schedule
        floor is paid once per chunk instead of once per frame.
        Adds N frames of latency (a live loop holds frames until the
        chunk fills) — the same throughput-vs-latency trade as run_chunk
        itself."""
        return self._chunk_batched(self.model.params, self.anchors,
                                   self.nwin, state, depths, colors, es,
                                   self.intrinsic, angles,
                                   jnp.asarray(dist, jnp.float32))

    def run_chunk_paired(self, state, depths, colors, es, angles, dist):
        """run_chunk_batched with the fuse scanned over frame PAIRS
        (fuse_render_pair_step_impl): one dense kernel pass fuses two
        frames, halving the pass's per-frame fixed costs. N must be even
        and the state warmed (n_obs >= 1 — fuse >= 1 frame via step()
        first; a cold frame-2 association would probe an empty
        histogram). Approximations vs run_chunk_batched, both bounded by
        tests: pair-second associations probe a one-frame-stale
        histogram; pair-first renders see one frame ahead."""
        assert depths.shape[0] % 2 == 0, "paired chunk needs even N"
        return self._chunk_batched_pair(self.model.params, self.anchors,
                                        self.nwin, state, depths, colors,
                                        es, self.intrinsic, angles,
                                        jnp.asarray(dist, jnp.float32))
