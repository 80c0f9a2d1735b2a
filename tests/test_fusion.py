"""Golden-value tests: JAX fusion update vs the literal NumPy oracle.

The oracle (fusion/fuse_ref.py) transcribes the CUDA tsdf_kernel
(reference src/SfM_CUDA/tsdf.cu:18-70) loop-for-loop; the JAX path must
match it bit-for-bit on integer buffers and to float tolerance on the SDF.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_maskrcnn_tpu.fusion import (FusionConfig, fuse_frame, init_state,
                                      init_from_first_frame)
from slam_maskrcnn_tpu.fusion.fuse_ref import fuse_frame_ref
from slam_maskrcnn_tpu.fusion.state import make_intrinsic, volume_bbox_from_depth
from slam_maskrcnn_tpu.data.synthetic import default_scene, render_frame, identity_pose_sequence

H, W = 60, 80
K4 = make_intrinsic(70.0, 70.0, W / 2, H / 2)
CFG = FusionConfig(vol_dim=(32, 32, 32), max_objects=32)


def _frames(n=3):
    scene = default_scene()
    out = []
    for E in identity_pose_sequence(n):
        depth, color, mask = render_frame(scene, E, K4, H, W)
        out.append((depth, color, mask, E))
    return out


def test_volume_bbox_matches_reference_semantics():
    depth = np.zeros((H, W), np.uint16)
    depth[10:40, 20:60] = 5000  # 1 m
    md = 1.0
    vs, ve = volume_bbox_from_depth(depth, K4, md)
    # back-project tl=(20,10), br=(60,40) at depth 1
    Ki = np.linalg.inv(K4)[:3, :3]
    tl = Ki @ [20, 10, 1]
    br = Ki @ [40 + 0, 30 + 10, 1]  # br exclusive: (60, 40)
    br = Ki @ [60, 40, 1]
    half = np.hypot(tl[0] - br[0], tl[1] - br[1]) / 2
    center = (tl + br) / 2
    np.testing.assert_allclose(vs, center - half, rtol=1e-5)
    np.testing.assert_allclose(ve, center + half, rtol=1e-5)
    # center z is the mean depth (backprojected z=1 * mean_depth)
    np.testing.assert_allclose((vs[2] + ve[2]) / 2, 1.0, rtol=1e-6)


def test_fuse_matches_numpy_oracle():
    cfg = FusionConfig(vol_dim=(24, 24, 24), max_objects=32)
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    state = init_from_first_frame(cfg, depth0, K4, md)

    diff = np.asarray(state.diff)
    color = np.asarray(state.color)
    weight = np.asarray(state.weight)
    hist = np.asarray(state.hist)
    vs = np.asarray(state.vol_start)
    vx = np.asarray(state.voxel)
    mu = float(state.mu)

    for depth, img, mask, E in frames[:3]:
        e2i = (E @ np.linalg.inv(frames[0][3])).astype(np.float32)
        state = fuse_frame(state, jnp.asarray(depth), jnp.asarray(img),
                           jnp.asarray(mask), jnp.asarray(e2i),
                           jnp.asarray(K4), cfg)
        diff, color, weight, hist = fuse_frame_ref(
            diff, color, weight, hist, vs, vx, mu, depth, img, mask, e2i, K4)

    # Integer buffers must match exactly. The SDF may differ at a handful of
    # voxels whose projected pixel lands on a depth discontinuity where f32
    # rounding flips the floor() by one pixel (the CUDA reference itself
    # would differ from both paths there); bound that to < 0.05% of voxels.
    np.testing.assert_array_equal(np.asarray(state.weight), weight)
    np.testing.assert_array_equal(np.asarray(state.hist), hist)
    np.testing.assert_array_equal(np.asarray(state.color), color)
    bad = ~np.isclose(np.asarray(state.diff), diff, atol=1e-5)
    assert bad.mean() < 5e-4, f"{bad.sum()} voxels mismatch"


def test_fuse_surface_sdf_sign():
    """After fusion, SDF should be negative just behind the observed surface
    and positive just in front (along the camera ray)."""
    frames = _frames(2)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    state = init_from_first_frame(CFG, depth0, K4, md)
    for depth, img, mask, E in frames:
        e2i = (E @ np.linalg.inv(frames[0][3])).astype(np.float32)
        state = fuse_frame(state, jnp.asarray(depth), jnp.asarray(img),
                           jnp.asarray(mask), jnp.asarray(e2i),
                           jnp.asarray(K4), CFG)
    diff = np.asarray(state.diff)
    wt = np.asarray(state.weight)
    scene = default_scene()
    # sample voxels with observations; compare SDF sign to analytic scene SDF
    vs = np.asarray(state.vol_start)
    vx = np.asarray(state.voxel)
    dims = CFG.vol_dim
    ii, jj, kk = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    pts = vs + np.stack([ii, jj, kk], -1) * vx  # first-camera frame == world (E0=identity rotation)
    # first pose has translation only; transform voxel pts to world
    E0 = frames[0][3]
    pts_w = (pts - E0[:3, 3]) @ np.eye(3)  # world = R^T (p - t), R = I
    true_sdf = scene.sdf(pts_w)
    seen = wt >= 2
    near = np.abs(true_sdf) > float(state.mu)  # well away from surface
    frac_correct = (np.sign(diff[seen & near]) == np.sign(true_sdf[seen & near])).mean()
    assert frac_correct > 0.95


def test_majority_vote_mode():
    cfg = FusionConfig(vol_dim=(16, 16, 16), majority_vote=True)
    frames = _frames(2)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    state = init_from_first_frame(cfg, depth0, K4, md)
    assert state.hist.shape == (1, 1, 1, 1)
    for depth, img, mask, E in frames:
        e2i = (E @ np.linalg.inv(frames[0][3])).astype(np.float32)
        state = fuse_frame(state, jnp.asarray(depth), jnp.asarray(img),
                           jnp.asarray(mask), jnp.asarray(e2i),
                           jnp.asarray(K4), cfg)
    mv_id = np.asarray(state.mv_id)
    mv_cnt = np.asarray(state.mv_cnt)
    assert (mv_cnt >= 0).all()
    assert set(np.unique(mv_id)) <= {0, 1, 2}
