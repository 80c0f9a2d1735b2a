"""Raycaster tests: trilinear interp + march vs the loop oracle, and
golden-geometry render of an analytic sphere SDF."""

import numpy as np
import jax.numpy as jnp

from slam_maskrcnn_tpu.fusion import FusionConfig, init_state
from slam_maskrcnn_tpu.fusion.raycast import (back_project_probe, camera_rays,
                                              orbit_camera, ray_march, render,
                                              render_orbit, trilinear)
from slam_maskrcnn_tpu.fusion.fuse_ref import interp_ref, ray_march_ref
from slam_maskrcnn_tpu.fusion.state import make_intrinsic

CFG = FusionConfig(vol_dim=(32, 32, 32))


def _sphere_state(center=(0.0, 0.0, 0.0), radius=0.3, extent=1.0):
    """State whose diff holds an analytic sphere SDF (metric units — the
    marcher only needs signs and approximate magnitudes near the surface)."""
    state = init_state(CFG, [-extent] * 3, [extent] * 3)
    dims = CFG.vol_dim
    vs = np.asarray(state.vol_start)
    vx = np.asarray(state.voxel)
    ii, jj, kk = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    pts = vs + np.stack([ii, jj, kk], -1) * vx
    sdf = np.linalg.norm(pts - np.asarray(center), axis=-1) - radius
    hist = np.asarray(state.hist).copy()
    hist[sdf < 0, 1] = 10  # instance 1 everywhere inside
    return state.replace(diff=jnp.asarray(sdf, jnp.float32),
                         hist=jnp.asarray(hist))


def test_trilinear_matches_oracle():
    rng = np.random.default_rng(0)
    state = _sphere_state()
    vol = np.asarray(state.diff)
    vs, vx = np.asarray(state.vol_start), np.asarray(state.voxel)
    pts = rng.uniform(-0.8, 0.8, size=(50, 3)).astype(np.float32)
    ours = np.asarray(trilinear(state.diff, state.vol_start, state.voxel,
                                jnp.asarray(pts)))
    ref = np.array([interp_ref(p, vs, vx, vol) for p in pts])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_trilinear_channels():
    state = _sphere_state()
    pts = jnp.asarray(np.random.default_rng(1).uniform(-0.5, 0.5, (10, 3)),
                      jnp.float32)
    out = trilinear(state.hist, state.vol_start, state.voxel, pts)
    assert out.shape == (10, CFG.max_objects)


def test_ray_march_hits_sphere():
    state = _sphere_state(radius=0.3)
    # rays from z=-2 toward origin should hit the sphere at distance ~1.7
    o = jnp.asarray([0.0, 0.0, -2.0])
    dirs = jnp.asarray([[0.0, 0.0, 1.0],   # center hit
                        [0.0, 1.0, 0.0]])  # miss (parallel, exits volume)
    hit, t = ray_march(state, o, dirs, CFG)
    hit, t = np.asarray(hit), np.asarray(t)
    assert hit[0] and not hit[1]
    assert abs(t[0] - 1.7) < 2 * float(state.voxel[0])


def test_ray_march_matches_oracle():
    state = _sphere_state(center=(0.05, -0.1, 0.1), radius=0.35)
    vs, ve = np.asarray(state.vol_start), np.asarray(state.vol_end)
    vx = np.asarray(state.voxel)
    diffnp = np.asarray(state.diff)
    rng = np.random.default_rng(2)
    o = np.array([0.3, 0.2, -1.8])
    dirs = rng.normal(size=(40, 3))
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.5  # roughly toward the volume
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    hit, t = ray_march(state, jnp.asarray(o, jnp.float32),
                       jnp.asarray(dirs, jnp.float32), CFG)
    hit, t = np.asarray(hit), np.asarray(t)
    for k in range(len(dirs)):
        rhit, rt = ray_march_ref(o, dirs[k], vs, ve, vx, diffnp)
        assert hit[k] == rhit, k
        if rhit:
            np.testing.assert_allclose(t[k], rt, rtol=1e-3, atol=1e-4)


def test_render_orbit_sphere_instance():
    state = _sphere_state(center=(0.0, 0.0, 1.0), radius=0.3, extent=1.0)
    # volume centered at origin: move it to be in front of an origin camera
    state = state.replace(vol_start=state.vol_start + jnp.asarray([0, 0, 1.0]),
                          vol_end=state.vol_end + jnp.asarray([0, 0, 1.0]))
    H, W = 48, 64
    K = make_intrinsic(60.0, 60.0, W / 2, H / 2)
    K_inv = np.linalg.inv(K)
    img = np.asarray(render_orbit(state, 0.0, 1.0, jnp.asarray(K_inv), H, W, CFG))
    # sphere of instance 1 should appear as palette color 1 near center
    center_px = img[H // 2, W // 2]
    np.testing.assert_array_equal(center_px, [60, 180, 75])
    assert (img[0, 0] == 0).all()  # background black
    # color mode renders too
    img_c = np.asarray(render_orbit(state, 0.0, 1.0, jnp.asarray(K_inv), H, W,
                                    CFG, mode="color"))
    assert img_c.shape == (H, W, 3)


def test_back_project_probe_shapes_and_values():
    state = _sphere_state(center=(0.0, 0.0, 1.0), radius=0.3)
    state = state.replace(vol_start=state.vol_start + jnp.asarray([0, 0, 1.0]),
                          vol_end=state.vol_end + jnp.asarray([0, 0, 1.0]),
                          n_obs=jnp.asarray(5, jnp.int32))
    H, W = 48, 64
    K = make_intrinsic(60.0, 60.0, W / 2, H / 2)
    K_inv = np.linalg.inv(K)
    e2i = np.eye(4, dtype=np.float32)
    probs, box_mask = back_project_probe(state, jnp.asarray(e2i),
                                         jnp.asarray(K_inv), H, W, CFG)
    probs, box_mask = np.asarray(probs), np.asarray(box_mask)
    assert probs.shape == (H, W, CFG.max_objects)
    # center pixel hits the sphere: bin 1 carries the counts
    # (the hit lies on the surface, so trilinear mixes inside(10)/outside(0))
    assert probs[H // 2, W // 2, 1] > 2.0
    assert box_mask[H // 2, W // 2, 1]
    assert probs[0, 0].sum() == 0  # corner ray misses
