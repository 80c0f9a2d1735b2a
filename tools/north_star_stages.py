"""North-star per-stage budget on the real TPU (VERDICT r2 "next" #1).

Times every stage of the composed north-star frame (BASELINE.md:30-33 —
the reference's fuse-then-view driver, ``src/SfM_CUDA/kernel.cpp:64-107``)
as standalone jits with REAL data dependence (state carried, frames
varying) and writes the stage table next to the bench row:

  detect         Mask R-CNN 1024^2 molded forward (resnet101)
  fuse           blocked Pallas fuse at 512^3 (pre-classified DMA skip)
  shell          camera-free surface-shell compaction (render input)
  probe          association probe — cfg.probe_mode: "depth" (live-depth
                 back-projection) or "splat" (stored-shell projection)
  probe_decode   per-pixel histogram row fetch shared by both probe modes
  assoc          instance association (one-hot matmul scores + greedy)
  render         orbit splat + shade (in-loop viewer frame)

Timing protocol per CLAUDE.md: chained calls, one readback, best-of-3
(block_until_ready does not block through the axon relay).

    python tools/north_star_stages.py [--out NORTH_STAR_STAGES.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

H, W = 480, 640


def timeit(name, fn, *args, n=12, reps=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _r in range(reps):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, (time.time() - t0) / n * 1000)
    print(f"[stages] {name}: {best:.1f} ms", flush=True)
    return round(best, 2)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "NORTH_STAR_STAGES.json"))
    ap.add_argument("--probe-mode", default="depth",
                    choices=("depth", "splat"))
    ap.add_argument("--vol", type=int, default=512)
    ap.add_argument("--sparse", action="store_true",
                    help="enable the sparse fuse main pass for A/B "
                         "timing (measured at parity with the dense "
                         "grid — the production default is dense)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from slam_maskrcnn_tpu.data.synthetic import (default_scene,
                                                  make_sequence)
    from slam_maskrcnn_tpu.fusion import FusionConfig
    from slam_maskrcnn_tpu.fusion.associate import associate_instances
    from slam_maskrcnn_tpu.fusion.splat import (_compact_shell,
                                                _depth_probe_jit,
                                                _probe_decode, _shade,
                                                _splat_from_rows,
                                                pinhole_of_extrinsic,
                                                pinhole_of_orbit)
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic
    from slam_maskrcnn_tpu.models import Config, MaskRCNN, get_anchors
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        fuse_frame_blocked_impl, init_blocked_from_first_frame)

    K4 = make_intrinsic(520.9, 521.0, 325.1, 249.7)
    cfg = FusionConfig(vol_dim=(args.vol,) * 3, hist_dtype=jnp.uint16,
                       splat_max_blocks=8192,
                       splat_max_surface=1024 * 1024, splat_max_rows=49152,
                       near_block_budget=512, pallas_rect=(48, 256),
                       pallas_rect_mid=(128, 384), mid_block_budget=1024,
                       probe_mode=args.probe_mode,
                       probe_stride=2 if args.probe_mode == "depth" else 1,
                       splat_row_cap=20,
                       pallas_sparse=args.sparse)
    frames = make_sequence(default_scene(), K4, H, W, n_frames=4)
    state = init_blocked_from_first_frame(cfg, frames[0]["depth"], K4,
                                          frames[0]["mean_depth"])
    E0i = np.linalg.inv(frames[0]["extrinsic"]).astype(np.float32)
    staged = [(jnp.asarray(fr["depth"]), jnp.asarray(fr["color"]),
               jnp.asarray(fr["mask"]),
               jnp.asarray((fr["extrinsic"] @ E0i).astype(np.float32)))
              for fr in frames[1:]]
    Kj = jnp.asarray(K4)
    dist = jnp.float32(frames[0]["mean_depth"])
    table = {"vol": args.vol, "probe_mode": args.probe_mode,
             "H": H, "W": W}

    # ---- detect (1024^2 molded forward, the north-star model config) ----
    class BenchConfig(Config):
        NAME = "bench"
        BACKBONE = "resnet101"
        NUM_CLASSES = 81
        IMAGES_PER_GPU = 1
        GPU_COUNT = 1

    mcfg = BenchConfig()
    model = MaskRCNN("inference", mcfg)
    variables = model.init_params(0)
    anchors = jnp.asarray(get_anchors(mcfg, mcfg.IMAGE_SHAPE))
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 1024, 1024, 3).astype(np.float32))
    windows = jnp.asarray([[0.109375, 0.0, 0.890625, 1.0]], jnp.float32)
    fwd = jax.jit(lambda v, im, a, w: model.module.apply(v, im, a, w))
    table["detect"] = timeit("detect", fwd, variables, images, anchors,
                             windows, n=8)
    del variables, images
    # ---- fuse (donated ping-pong through the state) ----
    fuse_j = jax.jit(
        lambda st, d, c, m, e: fuse_frame_blocked_impl(st, d, c, m, e, Kj,
                                                       cfg),
        donate_argnums=(0,))
    for d, c, m, e in staged:
        state, miss = fuse_j(state, d, c, m, e)
    _ = float(jnp.sum(state.weight))
    table["misses"] = int(miss)
    d, c, m, e = staged[0]
    best = 1e9
    for _r in range(3):
        t0 = time.time()
        for _ in range(6):
            state, miss = fuse_j(state, d, c, m, e)
        _ = float(jnp.sum(state.weight))
        best = min(best, (time.time() - t0) / 6 * 1000)
    table["fuse"] = round(best, 2)
    print(f"[stages] fuse: {best:.1f} ms", flush=True)

    # ---- shell compaction (render input; probe input in splat mode) ----
    shell_j = jax.jit(lambda diff: _compact_shell(
        diff, state.vol_start, state.voxel, state.nby, state.nbz,
        cfg.splat_max_blocks, cfg.splat_max_rows, cfg.splat_shell_band))
    rows = shell_j(state.diff)
    table["shell"] = timeit("shell", lambda diff: shell_j(diff)["px"],
                            state.diff)

    # ---- probe ----
    if args.probe_mode == "depth":
        probe_j = jax.jit(lambda dd, h, ee: _depth_probe_jit(
            dd, h, state.vol_start, state.voxel, ee, Kj, state.nbx,
            state.nby, state.nbz, H, W, jnp.asarray(cfg.box_mask_thresh),
            jnp.asarray(cfg.depth_scale, jnp.float32),
            stride=cfg.probe_stride)[0])
        table["probe"] = timeit("probe(depth, incl decode)", probe_j, d,
                                state.hist, e)
        probs = probe_j(d, state.hist, e)
        table["probe_decode"] = 0.0  # included in probe above
    else:
        def probe_fn(rows_, e_):
            M, m4 = pinhole_of_extrinsic(e_, Kj)
            _, vid, _, _ = _splat_from_rows(
                rows_, M, m4, H, W, cfg.splat_max_blocks,
                cfg.splat_max_rows, cfg.splat_max_surface,
                cfg.splat_row_cap, fill=True)
            return vid
        probe_j = jax.jit(probe_fn)
        table["probe"] = timeit("probe(splat)", probe_j, rows, e)
        vid = probe_j(rows, e)
        dec_j = jax.jit(
            lambda v, h: _probe_decode(v, h, H, W, cfg.box_mask_thresh)[0])
        table["probe_decode"] = timeit("probe_decode", dec_j, vid,
                                       state.hist)
        probs = dec_j(vid, state.hist)

    # ---- associate (masks strided to the probe grid) ----
    s = cfg.probe_stride if args.probe_mode == "depth" else 1
    bm = probs > cfg.box_mask_thresh
    assoc_j = jax.jit(lambda p, b, mk: associate_instances(
        p, b, mk, state.n_obs, state.num_objs, cfg)[0])
    table["assoc"] = timeit("assoc", assoc_j, probs, bm, m[::s, ::s])

    # ---- render (orbit splat + shade) ----
    def render_fn(ang, rows_, cpk, h):
        M, m4 = pinhole_of_orbit(ang, dist, Kj)
        zbuf, vid2, _, _ = _splat_from_rows(
            rows_, M, m4, H, W, cfg.splat_max_blocks, cfg.splat_max_rows,
            cfg.splat_max_surface, cfg.splat_row_cap, fill=True)
        return _shade(zbuf.reshape(H, W), vid2.reshape(H, W), cpk, h,
                      "instance")
    render_j = jax.jit(render_fn)
    table["render"] = timeit("render", render_j, jnp.float32(0.3), rows,
                             state.colorpk, state.hist)

    # ---- candidate render (the production chunk's per-frame form:
    # the sorted/capped code set is carried and refreshed every
    # cfg.shell_refresh_every frames; see splat.select_candidates) ----
    from slam_maskrcnn_tpu.fusion.splat import (select_candidates,
                                                splat_from_candidates)

    @jax.jit
    def select_j(rows_, ang):
        M, m4 = pinhole_of_orbit(ang, dist, Kj)
        return select_candidates(rows_, M, m4, cfg.splat_row_cap)[0]

    cands = select_j(rows, jnp.float32(0.3))

    def render_c(ang, cands_, cpk, h):
        M, m4 = pinhole_of_orbit(ang, dist, Kj)
        zbuf, vid2 = splat_from_candidates(
            cands_, state.vol_start, state.voxel, state.nby, state.nbz,
            M, m4, H, W, fill=True)
        return _shade(zbuf.reshape(H, W), vid2.reshape(H, W), cpk, h,
                      "instance")
    table["render_cands"] = timeit("render(candidates)",
                                   jax.jit(render_c), jnp.float32(0.31),
                                   cands, state.colorpk, state.hist)

    stages = ["detect", "fuse", "shell", "probe", "probe_decode", "assoc",
              "render"]
    table["sum_ms"] = round(sum(table[s] for s in stages), 2)
    table["composed_fps_bound"] = round(1000.0 / table["sum_ms"], 2)
    # each row above is an ISOLATED jit: chained dispatch through the
    # axon relay adds ~3.5 ms per call even when batched (a trivial
    # table-packing jit measures 3.8 ms — PERFORMANCE.md round 3b), so
    # the sum overstates the composed one-jit frame; the bench's
    # north_star row is the ground truth
    table["dispatch_note"] = ("isolated-jit rows carry ~3.5 ms relay "
                              "dispatch each; the composed chunk rate "
                              "(bench.py north_star row) is the ground "
                              "truth")
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table), flush=True)


if __name__ == "__main__":
    main()
