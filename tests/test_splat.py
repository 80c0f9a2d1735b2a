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
    probs_s, bm_s, ovf, clip = splat_probe(b, e2i, jnp.asarray(K4), H, W,
                                           CFG)
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
    zbuf, vid, overflow, _clip = splat_zbuffer(b, M, m4, H, W)
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
    _, _, ovf_ok, _ = splat_zbuffer(b, M, m4, H, W, max_rows=4096)
    _, _, ovf_tiny, _ = splat_zbuffer(b, M, m4, H, W, max_rows=8)
    assert int(ovf_ok) == 0
    assert int(ovf_tiny) > 0


def test_splat_row_cap_mode_matches_exact():
    """sort-compaction (row_cap) vs exact nonzero compaction: same depth
    buffer and same emptiness; winners may differ only within one z
    quantum (tie order)."""
    state = _sphere_state()
    b = to_blocked(state, CFG)
    M, m4 = pinhole_of_extrinsic(jnp.eye(4), jnp.asarray(K4))
    z0, v0, ovf0, clip0 = splat_zbuffer(b, M, m4, H, W)
    z1, v1, ovf1, clip1 = splat_zbuffer(b, M, m4, H, W, row_cap=128)
    assert int(ovf1) == int(ovf0) == 0
    assert int(clip0) == 0  # exact path never clips
    e0 = np.asarray(z0) > 1e30
    e1 = np.asarray(z1) > 1e30
    np.testing.assert_array_equal(e0, e1)
    near = np.abs(np.asarray(z0)[~e0] - np.asarray(z1)[~e1])
    assert near.max() < 2e-3  # one z quantum at the default budgets
    assert ((np.asarray(v0) >= 0) == (np.asarray(v1) >= 0)).all()


def test_depth_probe_matches_splat_probe():
    """probe_mode="depth" (live-depth back-projection) must agree with the
    splat probe on association: in a static scene the fused zero crossing
    sits at the observed depth, so both probes read the same ±mu
    histogram band (fusion/splat.py:_depth_probe_jit)."""
    from slam_maskrcnn_tpu.data.synthetic import default_scene, make_sequence
    from slam_maskrcnn_tpu.fusion import SemanticFusion
    from slam_maskrcnn_tpu.fusion.associate import associate_instances
    from slam_maskrcnn_tpu.fusion.splat import depth_probe

    Hs, Ws = 120, 160
    Ks = make_intrinsic(130.0, 130.0, Ws / 2, Hs / 2)
    cfg = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16)
    frames = make_sequence(default_scene(), Ks, Hs, Ws, n_frames=5)
    f = SemanticFusion(Ks, cfg, backend="xla")
    for fr in frames[:4]:
        f.parse_frame(fr["depth"], fr["color"], fr["mask"],
                      fr["extrinsic"], fr["mean_depth"])
    b = to_blocked(f.dense_state(), cfg)
    fr = frames[4]
    E0i = np.linalg.inv(frames[0]["extrinsic"]).astype(np.float32)
    e2i = jnp.asarray(fr["extrinsic"] @ E0i, jnp.float32)
    ps, bs, _, _ = splat_probe(b, e2i, jnp.asarray(Ks), Hs, Ws, cfg)
    pd, bd, ovf, clip = depth_probe(b, jnp.asarray(fr["depth"]), e2i,
                                    jnp.asarray(Ks), Hs, Ws, cfg)
    assert int(ovf) == 0 and int(clip) == 0  # depth path has no budgets
    ps, pd = np.asarray(ps), np.asarray(pd)
    # the two probes vote the same instance wherever both see surface
    # (residual disagreement is instance-boundary pixels, where the two
    # land one voxel apart; association aggregates over masks, below)
    both = (ps.sum(-1) > 0) & (pd.sum(-1) > 0)
    assert both.sum() > 500
    assert (ps.argmax(-1) == pd.argmax(-1))[both].mean() > 0.95
    assert (np.asarray(bs) == np.asarray(bd)).mean() > 0.99
    # and the association outcome is identical
    msk = jnp.asarray(fr["mask"])
    rl_s, no_s = associate_instances(jnp.asarray(ps), bs, msk, b.n_obs,
                                     b.num_objs, cfg)
    rl_d, no_d = associate_instances(jnp.asarray(pd), bd, msk, b.n_obs,
                                     b.num_objs, cfg)
    np.testing.assert_array_equal(np.asarray(rl_s), np.asarray(rl_d))
    assert int(no_s) == int(no_d)
    # stride-2 probing (cfg.probe_stride): association outcome unchanged
    cfg2 = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16,
                        probe_mode="depth", probe_stride=2)
    p2, b2, _, _ = depth_probe(b, jnp.asarray(fr["depth"]), e2i,
                               jnp.asarray(Ks), Hs, Ws, cfg2)
    assert p2.shape == (Hs // 2, Ws // 2, p2.shape[-1])
    rl_2, no_2 = associate_instances(p2, b2, msk[::2, ::2], b.n_obs,
                                     b.num_objs, cfg2)
    np.testing.assert_array_equal(np.asarray(rl_s), np.asarray(rl_2))
    assert int(no_s) == int(no_2)


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
