"""Paired-frame fusion (fuse_frames2_blocked_impl + the pipeline pair
step): the kernel composition must be BIT-exact vs two sequential
single-frame kernels given the same relabeled masks; the pipeline-level
pairing approximation (frame 2's association probes the pre-pair
histogram) must reproduce sequential outcomes on the synthetic fixture."""

import numpy as np
import jax
import jax.numpy as jnp

from slam_maskrcnn_tpu.data.synthetic import (default_scene,
                                              identity_pose_sequence,
                                              render_frame)
from slam_maskrcnn_tpu.fusion import FusionConfig, init_from_first_frame
from slam_maskrcnn_tpu.fusion.pipeline import (fuse_pair_sequence_blocked,
                                               fuse_sequence_blocked,
                                               fusion_step_blocked,
                                               fusion_step_pair_blocked_impl)
from slam_maskrcnn_tpu.fusion.state import make_intrinsic
from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
    fuse_frame_blocked, fuse_frames2_blocked_impl, to_blocked)

H, W = 120, 160
K4 = make_intrinsic(130.0, 130.0, W / 2, H / 2)
CFG = FusionConfig(vol_dim=(64, 64, 64), hist_dtype=jnp.uint16,
                   pallas_rect=(128, 256))


def _frames(n=5):
    scene = default_scene()
    out = []
    for E in identity_pose_sequence(n):
        d, c, m = render_frame(scene, E, K4, H, W)
        out.append((d, c, m, E))
    return out


def test_pair_kernel_bitexact_vs_sequential():
    """Same masks in -> the paired kernel must equal two sequential
    single-frame kernel launches bit-for-bit on every state array."""
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    b_seq = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    b_par = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    E0inv = np.linalg.inv(frames[0][3])

    # warm one frame on both (identical)
    d, c, m, E = frames[0]
    e0 = jnp.asarray((E @ E0inv).astype(np.float32))
    args0 = (jnp.asarray(d), jnp.asarray(c), jnp.asarray(m), e0,
             jnp.asarray(K4))
    b_seq, _ = fuse_frame_blocked(b_seq, *args0, CFG)
    b_par, _ = fuse_frame_blocked(b_par, *args0, CFG)

    (d1, c1, m1, E1), (d2, c2, m2, E2) = frames[1], frames[2]
    e1 = jnp.asarray((E1 @ E0inv).astype(np.float32))
    e2 = jnp.asarray((E2 @ E0inv).astype(np.float32))
    a1 = (jnp.asarray(d1), jnp.asarray(c1), jnp.asarray(m1), e1)
    a2 = (jnp.asarray(d2), jnp.asarray(c2), jnp.asarray(m2), e2)

    b_seq, ms1 = fuse_frame_blocked(b_seq, *a1, jnp.asarray(K4), CFG)
    b_seq, ms2 = fuse_frame_blocked(b_seq, *a2, jnp.asarray(K4), CFG)
    b_par, msp = jax.jit(
        lambda b, a1, a2: fuse_frames2_blocked_impl(
            b, *a1, *a2, jnp.asarray(K4), CFG))(b_par, a1, a2)
    assert int(ms1) == int(ms2) == 0 and int(msp) == 0
    assert int(b_par.n_obs) == int(b_seq.n_obs)
    assert int(jnp.sum(b_seq.weight)) > 0, "fixture must fuse something"
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b_par, f)), np.asarray(getattr(b_seq, f)),
            err_msg=f"pair kernel field {f}")


def test_pair_pipeline_matches_sequential_on_fixture():
    """Full pair step (associations included): on the synthetic fixture
    every object is visible from frame 0, so frame 2's one-frame-stale
    probe reaches the same association outcomes and the whole pair step
    reproduces the sequential steps exactly (masks, then bitwise state).
    Harder scenes may legitimately diverge — this gate pins the
    approximation's behavior where it should be invisible."""
    frames = _frames(5)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    b_seq = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    b_par = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    E0inv = np.linalg.inv(frames[0][3])
    Kj = jnp.asarray(K4)

    # warm one sequential frame each (pairing needs n_obs >= 1)
    d, c, m, E = frames[0]
    e0 = jnp.asarray((E @ E0inv).astype(np.float32))
    b_seq, _mg, _ = fusion_step_blocked(b_seq, jnp.asarray(d),
                                        jnp.asarray(c), jnp.asarray(m),
                                        e0, Kj, CFG)
    b_par, _mg, _ = fusion_step_blocked(b_par, jnp.asarray(d),
                                        jnp.asarray(c), jnp.asarray(m),
                                        e0, Kj, CFG)

    stack = [frames[i] for i in (1, 2, 3, 4)]
    depths = jnp.stack([jnp.asarray(f[0]) for f in stack])
    colors = jnp.stack([jnp.asarray(f[1]) for f in stack])
    masks = jnp.stack([jnp.asarray(f[2]) for f in stack])
    es = jnp.stack([jnp.asarray((f[3] @ E0inv).astype(np.float32))
                    for f in stack])

    b_seq, mg_seq, mi_seq = fuse_sequence_blocked(
        b_seq, depths, colors, masks, es, Kj, CFG)
    b_par, mg_par, mi_par = jax.jit(
        lambda b, d, c, m, e: fuse_pair_sequence_blocked(
            b, d, c, m, e, Kj, CFG))(b_par, depths, colors, masks, es)
    assert int(jnp.sum(mi_seq)) == 0 and int(jnp.sum(mi_par)) == 0
    np.testing.assert_array_equal(np.asarray(mg_par), np.asarray(mg_seq),
                                  err_msg="pair relabeled masks")
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b_par, f)), np.asarray(getattr(b_seq, f)),
            err_msg=f"pair pipeline field {f}")
