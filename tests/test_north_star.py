"""North-star composition (samples/north_star.py): detect -> label-encode
-> blocked fuse -> in-loop render as one device program, at tiny scale.

Checks (a) the fused state matches running detect + fusion_step_blocked
separately (the shared-shell probe is the same computation as
splat_probe), (b) the scan chunk form matches the per-call form, (c) the
render is a well-formed image."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_maskrcnn_tpu.data.synthetic import default_scene, make_sequence
from slam_maskrcnn_tpu.fusion import FusionConfig
from slam_maskrcnn_tpu.fusion.pipeline import fusion_step_blocked
from slam_maskrcnn_tpu.fusion.state import make_intrinsic
from slam_maskrcnn_tpu.models import Config, MaskRCNN
from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
    init_blocked_from_first_frame)
from slam_maskrcnn_tpu.samples.north_star import NorthStar


class TinyConfig(Config):
    NAME = "tiny"
    BACKBONE = "resnet50"
    IMAGE_MIN_DIM = 128
    IMAGE_MAX_DIM = 128
    NUM_CLASSES = 4
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    POST_NMS_ROIS_INFERENCE = 50
    PRE_NMS_LIMIT = 200
    DETECTION_MAX_INSTANCES = 10
    IMAGES_PER_GPU = 1
    GPU_COUNT = 1
    DETECTION_MIN_CONFIDENCE = 0.0
    COMPUTE_DTYPE = "float32"


def _setup(H=96, W=128, n_frames=4):
    K4 = make_intrinsic(100.0, 100.0, W / 2, H / 2)
    frames = make_sequence(default_scene(), K4, H, W, n_frames=n_frames)
    model = MaskRCNN("inference", TinyConfig())
    model.init_params(0)
    cfg = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16)
    state = init_blocked_from_first_frame(cfg, frames[0]["depth"], K4,
                                          frames[0]["mean_depth"])
    E0i = np.linalg.inv(frames[0]["extrinsic"]).astype(np.float32)
    staged = [(jnp.asarray(fr["depth"]), jnp.asarray(fr["color"]),
               jnp.asarray((fr["extrinsic"] @ E0i).astype(np.float32)))
              for fr in frames[1:]]
    return model, K4, cfg, state, staged, frames[0]["mean_depth"]


def test_north_star_step_matches_split_pipeline():
    model, K4, cfg, state, staged, dist = _setup()
    ns = NorthStar(model, K4, cfg, 96, 128)

    state_ref = jax.tree.map(lambda x: x.copy(), state)
    state_ns = jax.tree.map(lambda x: x.copy(), state)
    Kj = jnp.asarray(K4)
    for i, (d, c, e) in enumerate(staged):
        state_ns, render, mask_g_ns, miss_ns = ns.step(
            state_ns, d, c, e, 0.01 * (i + 1), dist)
        # reference composition: the model's own detect mask + the
        # standard blocked fusion step
        mask = _detect_mask(ns, model, c, 96, 128)
        state_ref, mask_g_ref, miss_ref = fusion_step_blocked(
            state_ref, d, c, mask, e, Kj, cfg)
        np.testing.assert_array_equal(np.asarray(mask_g_ns),
                                      np.asarray(mask_g_ref))
        assert int(miss_ns) == int(miss_ref)
    np.testing.assert_array_equal(np.asarray(state_ns.weight),
                                  np.asarray(state_ref.weight))
    np.testing.assert_allclose(np.asarray(state_ns.diff),
                               np.asarray(state_ref.diff), rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(state_ns.hist),
                                  np.asarray(state_ref.hist))
    img = np.asarray(render)
    assert img.shape == (96, 128, 3) and img.dtype == np.uint8


def _detect_mask(ns, model, color_bgr, H, W):
    from slam_maskrcnn_tpu.models.mask_ops import label_masks_device

    rh, rw, top, left, mh, mw = ns.geom

    @jax.jit
    def f(params, c):
        rgb = c[..., ::-1].astype(jnp.float32)
        img = jax.image.resize(rgb, (rh, rw, 3), method="bilinear")
        img = jnp.pad(img, ((top, mh - rh - top), (left, mw - rw - left),
                            (0, 0)))
        molded = (img - jnp.asarray(ns.mean_pixel))[None]
        out = model.module.apply(params, molded, ns.anchors, ns.nwin)
        return label_masks_device(out["detections"][0], out["masks"][0],
                                  ns.nwin[0], (H, W), min_area=2000)

    return f(model.params, color_bgr)


def test_north_star_depth_probe_mode_runs_and_fuses_identically():
    """The bench configuration (probe_mode="depth", probe_stride=2) must
    produce the same fused state as the splat-probe step on a scene where
    the two probes agree (tests/test_splat.py asserts the association
    equality directly; this covers the north-star wiring — strided masks
    into association, probe bypassing the shared shell)."""
    model, K4, cfg, state, staged, dist = _setup()
    cfg_d = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16,
                         probe_mode="depth", probe_stride=2)
    ns_s = NorthStar(model, K4, cfg, 96, 128)
    ns_d = NorthStar(model, K4, cfg_d, 96, 128)
    st_s = jax.tree.map(lambda x: x.copy(), state)
    st_d = jax.tree.map(lambda x: x.copy(), state)
    for i, (d, c, e) in enumerate(staged):
        st_s, _, mg_s, miss_s = ns_s.step(st_s, d, c, e, 0.01 * (i + 1),
                                          dist)
        st_d, render, mg_d, miss_d = ns_d.step(st_d, d, c, e,
                                               0.01 * (i + 1), dist)
        np.testing.assert_array_equal(np.asarray(mg_s), np.asarray(mg_d))
    np.testing.assert_array_equal(np.asarray(st_s.weight),
                                  np.asarray(st_d.weight))
    np.testing.assert_array_equal(np.asarray(st_s.hist),
                                  np.asarray(st_d.hist))
    img = np.asarray(render)
    assert img.shape == (96, 128, 3) and img.dtype == np.uint8


def test_north_star_chunk_matches_percall():
    model, K4, cfg, state, staged, dist = _setup()
    ns = NorthStar(model, K4, cfg, 96, 128)

    state_a = jax.tree.map(lambda x: x.copy(), state)
    renders = []
    for i, (d, c, e) in enumerate(staged):
        state_a, render, _, _ = ns.step(state_a, d, c, e,
                                        0.01 * (i + 1), dist)
        renders.append(np.asarray(render))

    depths = jnp.stack([s[0] for s in staged])
    colors = jnp.stack([s[1] for s in staged])
    es = jnp.stack([s[2] for s in staged])
    angles = jnp.asarray([0.01 * (i + 1) for i in range(len(staged))],
                         jnp.float32)
    state_b, renders_b, masks_b, misses = ns.run_chunk(
        jax.tree.map(lambda x: x.copy(), state), depths, colors, es,
        angles, dist)
    np.testing.assert_array_equal(np.asarray(state_a.weight),
                                  np.asarray(state_b.weight))
    np.testing.assert_array_equal(np.asarray(state_a.hist),
                                  np.asarray(state_b.hist))
    for i, r in enumerate(renders):
        np.testing.assert_array_equal(r, np.asarray(renders_b[i]))

    # the batched-detect chunk (detect hoisted out of the scan as one
    # model apply): hoisting itself is semantics-preserving (detect has
    # no state dependence), but XLA lowers batch-N convs differently
    # from batch-1, so the model forward is not bit-identical — a few
    # mask BORDER pixels can flip (measured: 4 of 8.4M hist entries,
    # off by one vote). Assert near-equality with tight bounds.
    state_c, renders_c, masks_c, misses_c = ns.run_chunk_batched(
        jax.tree.map(lambda x: x.copy(), state), depths, colors, es,
        angles, dist)
    np.testing.assert_array_equal(np.asarray(state_a.weight),
                                  np.asarray(state_c.weight))
    hist_a = np.asarray(state_a.hist).astype(np.int64)
    hist_c = np.asarray(state_c.hist).astype(np.int64)
    n_diff = int((hist_a != hist_c).sum())
    assert n_diff <= hist_a.size * 1e-4, n_diff
    assert int(np.abs(hist_a - hist_c).max()) <= len(staged)
    mb, mc = np.asarray(masks_b), np.asarray(masks_c)
    assert (mb != mc).mean() <= 1e-3, (mb != mc).mean()
    for i, r in enumerate(renders):
        rc_ = np.asarray(renders_c[i])
        assert (r != rc_).mean() <= 2e-3, (r != rc_).mean()


def test_north_star_shell_refresh_amortization():
    """shell_refresh_every=3 with the depth probe: the fused state and
    global-id masks must be IDENTICAL to refresh-every-frame (the shell
    feeds only the render there); renders may differ only in the stale
    shell geometry — on a static scene that is a small pixel fraction."""
    model, K4, _, state, staged, dist = _setup(n_frames=6)
    cfg1 = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16,
                        probe_mode="depth")
    cfg3 = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16,
                        probe_mode="depth", shell_refresh_every=3)
    ns1 = NorthStar(model, K4, cfg1, 96, 128)
    ns3 = NorthStar(model, K4, cfg3, 96, 128)
    depths = jnp.stack([s[0] for s in staged])
    colors = jnp.stack([s[1] for s in staged])
    es = jnp.stack([s[2] for s in staged])
    angles = jnp.asarray([0.01 * (i + 1) for i in range(len(staged))],
                         jnp.float32)
    st1, r1, m1, miss1 = ns1.run_chunk_batched(
        jax.tree.map(lambda x: x.copy(), state), depths, colors, es,
        angles, dist)
    st3, r3, m3, miss3 = ns3.run_chunk_batched(
        jax.tree.map(lambda x: x.copy(), state), depths, colors, es,
        angles, dist)
    np.testing.assert_array_equal(np.asarray(st1.weight),
                                  np.asarray(st3.weight))
    np.testing.assert_array_equal(np.asarray(st1.hist),
                                  np.asarray(st3.hist))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m3))
    frac = (np.asarray(r1) != np.asarray(r3)).mean()
    assert frac <= 0.02, f"stale-shell render delta too large: {frac}"

    # the per-call path caches candidates host-side on the SAME schedule
    # (refresh at calls 0, N, 2N ...) — outputs must match the chunk
    ns3b = NorthStar(model, K4, cfg3, 96, 128)
    st_p = jax.tree.map(lambda x: x.copy(), state)
    renders_p = []
    for i, (d, c, e) in enumerate(staged):
        st_p, render, mg, miss = ns3b.step(st_p, d, c, e,
                                           0.01 * (i + 1), dist)
        renders_p.append(np.asarray(render))
    np.testing.assert_array_equal(np.asarray(st3.weight),
                                  np.asarray(st_p.weight))
    # per-call detect is batch-1 (the chunk's is batch-N): a few mask
    # border pixels flip, so hist compares loosely (same bound as the
    # batched-vs-scan comparison above)
    h3 = np.asarray(st3.hist).astype(np.int64)
    hp = np.asarray(st_p.hist).astype(np.int64)
    assert (h3 != hp).sum() <= h3.size * 1e-4
    for i, r in enumerate(renders_p):
        rc3 = np.asarray(r3[i])
        assert (r != rc3).mean() <= 2e-3, (i, (r != rc3).mean())


def test_north_star_paired_chunk_matches_batched():
    """run_chunk_paired (one dense fuse pass per frame PAIR) vs
    run_chunk_batched on the synthetic fixture, warmed state: the fused
    state, global-id masks and per-pair miss sums must be bit-identical
    (associations agree here — tests/test_fuse_pair.py pins the pairing
    approximation), and pair-SECOND renders must be bit-identical
    (pair-first renders legitimately see one frame ahead)."""
    model, K4, _, state, staged, dist = _setup(n_frames=6)  # 5 staged
    cfg = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16,
                       probe_mode="depth", shell_refresh_every=2)
    ns = NorthStar(model, K4, cfg, 96, 128)

    d0, c0, e0 = staged[0]
    st_b, _, _, _ = ns.step(jax.tree.map(lambda x: x.copy(), state),
                            d0, c0, e0, 0.01, dist)
    st_p = jax.tree.map(lambda x: x.copy(), st_b)

    rest = staged[1:]  # 4 frames -> 2 pairs
    depths = jnp.stack([s[0] for s in rest])
    colors = jnp.stack([s[1] for s in rest])
    es = jnp.stack([s[2] for s in rest])
    angles = jnp.asarray([0.01 * (i + 2) for i in range(len(rest))],
                         jnp.float32)
    st_b, r_b, m_b, mi_b = ns.run_chunk_batched(st_b, depths, colors,
                                                es, angles, dist)
    st_p, r_p, m_p, mi_p = ns.run_chunk_paired(st_p, depths, colors,
                                               es, angles, dist)
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_p, f)), np.asarray(getattr(st_b, f)),
            err_msg=f"paired chunk state field {f}")
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_b))
    mi_b_np = np.asarray(mi_b).reshape(-1, 2).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(mi_p), mi_b_np)
    assert r_p.shape == r_b.shape
    for i in (1, 3):  # pair-second frames: same post-fuse state + cands
        np.testing.assert_array_equal(
            np.asarray(r_p[i]), np.asarray(r_b[i]),
            err_msg=f"pair-second render frame {i}")
    for i in (0, 2):  # pair-first: one-frame-ahead state, bounded delta
        # (frame 2's render sees frame 3's fused data; a NEW object
        # appears at frames 2/3 on this fixture, so its whole footprint
        # differs — measured 6.6% of pixels at frame 2)
        frac = (np.asarray(r_p[i]) != np.asarray(r_b[i])).mean()
        assert frac <= 0.09, (i, frac)
