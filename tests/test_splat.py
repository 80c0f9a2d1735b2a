"""Splat renderer/probe vs the exact ray-march on an analytic sphere."""

import numpy as np
import jax.numpy as jnp

from slam_maskrcnn_tpu.fusion import FusionConfig, init_state, render_orbit
from slam_maskrcnn_tpu.fusion.raycast import back_project_probe
from slam_maskrcnn_tpu.fusion.splat import (pinhole_of_extrinsic,
                                            pinhole_of_orbit, splat_probe,
                                            splat_render, splat_zbuffer)
from slam_maskrcnn_tpu.fusion.state import make_intrinsic
from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import to_blocked

CFG = FusionConfig(vol_dim=(64, 64, 64), hist_dtype=jnp.uint16)
H, W = 96, 128
K4 = make_intrinsic(110.0, 110.0, W / 2, H / 2)


def _sphere_state(center=(0.0, 0.0, 1.0), radius=0.25):
    state = init_state(CFG, [-0.6, -0.6, 0.4], [0.6, 0.6, 1.6])
    dims = CFG.vol_dim
    vs = np.asarray(state.vol_start)
    vx = np.asarray(state.voxel)
    ii, jj, kk = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    pts = vs + np.stack([ii, jj, kk], -1) * vx
    sdf = np.linalg.norm(pts - np.asarray(center), axis=-1) - radius
    mu = float(state.mu)
    sdfn = np.clip(sdf / mu, -1, 1).astype(np.float32)  # normalized field
    hist = np.asarray(state.hist).copy()
    hist[(sdfn < 0), 1] = 7
    color = np.asarray(state.color).copy()
    color[sdfn < 0] = [10, 200, 30]
    return state.replace(diff=jnp.asarray(sdfn), hist=jnp.asarray(hist),
                         color=jnp.asarray(color))


def test_splat_matches_march_silhouette():
    state = _sphere_state()
    b = to_blocked(state, CFG)
    img_march = np.asarray(render_orbit(state, 0.35, 1.0,
                                        jnp.asarray(np.linalg.inv(K4)),
                                        H, W, CFG))
    M, m4 = pinhole_of_orbit(0.35, 1.0, jnp.asarray(K4))
    img_splat = np.asarray(splat_render(b, M, m4, H, W, CFG))
    a = img_march.max(-1) > 0
    s = img_splat.max(-1) > 0
    inter = (a & s).sum()
    union = (a | s).sum()
    assert union > 200  # sphere visible in both
    assert inter / union > 0.85, f"IoU {inter / union}"
    # same instance color where both lit
    both = a & s
    assert (img_march[both] == img_splat[both]).all(axis=-1).mean() > 0.95


def test_splat_color_mode():
    state = _sphere_state()
    b = to_blocked(state, CFG)
    M, m4 = pinhole_of_orbit(0.0, 1.0, jnp.asarray(K4))
    img = np.asarray(splat_render(b, M, m4, H, W, CFG, mode="color"))
    lit = img.max(-1) > 0
    assert lit.sum() > 200
    # RGB output of BGR-stored color (10,200,30) -> (30,200,10)
    center = img[H // 2, W // 2]
    np.testing.assert_array_equal(center, [30, 200, 10])


def test_splat_probe_matches_march_probe():
    state = _sphere_state()
    state = state.replace(n_obs=jnp.asarray(5, jnp.int32))
    b = to_blocked(state, CFG)
    e2i = jnp.eye(4)
    probs_m, bm_m = back_project_probe(state, e2i,
                                       jnp.asarray(np.linalg.inv(K4)),
                                       H, W, CFG)
    probs_s, bm_s, ovf = splat_probe(b, e2i, jnp.asarray(K4), H, W, CFG)
    assert int(ovf) == 0
    pm = np.asarray(probs_m)
    ps = np.asarray(probs_s)
    # bin 1 dominates at sphere pixels in both
    a = pm[..., 1] > 0.5
    s = ps[..., 1] > 0.5
    inter, union = (a & s).sum(), (a | s).sum()
    assert union > 100
    assert inter / union > 0.8, f"probe IoU {inter / union}"


def test_splat_zbuffer_depth_plausible():
    state = _sphere_state(center=(0.0, 0.0, 1.0), radius=0.25)
    b = to_blocked(state, CFG)
    M, m4 = pinhole_of_extrinsic(jnp.eye(4), jnp.asarray(K4))
    zbuf, vid, overflow = splat_zbuffer(b, M, m4, H, W)
    z = np.asarray(zbuf).reshape(H, W)
    # raw zbuffer has holes (voxel spacing > pixel spacing); take the
    # neighborhood min around the center
    patch = z[H // 2 - 2:H // 2 + 3, W // 2 - 2:W // 2 + 3]
    center_z = patch.min()
    assert abs(center_z - 0.75) < 0.05  # sphere front at z = 1 - 0.25
    assert int(overflow) == 0  # budgets not exceeded


def test_splat_row_budget_overflow_feeds_miss_channel():
    """The two-level compaction's row budget must surface drops, not hide
    them: with max_rows below the occupied-row count, `overflow` > 0."""
    state = _sphere_state()
    b = to_blocked(state, CFG)
    M, m4 = pinhole_of_extrinsic(jnp.eye(4), jnp.asarray(K4))
    _, _, ovf_ok = splat_zbuffer(b, M, m4, H, W, max_rows=4096)
    _, _, ovf_tiny = splat_zbuffer(b, M, m4, H, W, max_rows=8)
    assert int(ovf_ok) == 0
    assert int(ovf_tiny) > 0


def test_splat_row_cap_mode_matches_exact():
    """sort-compaction (row_cap) vs exact nonzero compaction: same depth
    buffer and same emptiness; winners may differ only within one z
    quantum (tie order)."""
    state = _sphere_state()
    b = to_blocked(state, CFG)
    M, m4 = pinhole_of_extrinsic(jnp.eye(4), jnp.asarray(K4))
    z0, v0, ovf0 = splat_zbuffer(b, M, m4, H, W)
    z1, v1, ovf1 = splat_zbuffer(b, M, m4, H, W, row_cap=128)
    assert int(ovf1) == int(ovf0) == 0
    e0 = np.asarray(z0) > 1e30
    e1 = np.asarray(z1) > 1e30
    np.testing.assert_array_equal(e0, e1)
    near = np.abs(np.asarray(z0)[~e0] - np.asarray(z1)[~e1])
    assert near.max() < 2e-3  # one z quantum at the default budgets
    assert ((np.asarray(v0) >= 0) == (np.asarray(v1) >= 0)).all()


def test_orbit_renderer_matches_uncached():
    """The viewer-loop OrbitRenderer (shell compaction cached across
    frames) must render identically to the per-call orbit splat."""
    from slam_maskrcnn_tpu.fusion.splat import (OrbitRenderer,
                                                splat_render_orbit)

    state = _sphere_state()
    b = to_blocked(state, CFG)
    orb = OrbitRenderer(b, K4, H, W, CFG)
    for k, mode in ((1, "instance"), (3, "color")):
        angle = 0.05 * k
        want = np.asarray(splat_render_orbit(b, angle, 1.5,
                                             jnp.asarray(K4), H, W, CFG,
                                             mode=mode))
        got = np.asarray(orb.render(angle, 1.5, mode=mode))
        np.testing.assert_array_equal(got, want)
