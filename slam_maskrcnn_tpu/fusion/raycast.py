"""TSDF raycasting — back-projection probe and renderer.

TPU-native re-design of the reference's two CUDA ray kernels:
``back_proj_kernel`` (``src/SfM_CUDA/tsdf.cu:72-135``) and
``show_tsdf_kernel`` (``src/SfM_CUDA/viewer.cu:17-86``). Both share one ray
marcher; only the shading differs, so we factor exactly that way.

Design note (SURVEY §7 "hard parts"): CUDA lets each ray diverge; TPU does
not. The march is one vectorized ``lax.while_loop`` over the whole pixel
grid — every live ray advances per iteration, finished rays are masked, and
the loop exits when all rays are done (or at cfg.max_march_steps). The
adaptive step rule (full voxel, then voxel/4 once |f| < voxel/2,
``tsdf.cu:116-119``) is preserved per-ray via masking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from slam_maskrcnn_tpu.fusion.state import FusionConfig, TSDFState

# 32-entry instance palette from the reference viewer (viewer.cu:93-126);
# stored RGB, the reference swaps to BGR at write (viewer.cu:82).
# numpy, NOT jnp: a module-level jax array is a concrete device buffer that
# capturing traces lift as a hidden executable parameter, tripping the
# jax-0.9 C++ fastpath buffer miscount (see splat.BIG). Index with
# jnp.asarray(INSTANCE_PALETTE) inside traces.
INSTANCE_PALETTE = np.array([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
    [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
    [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
], dtype=np.uint8)


def trilinear(vol: jax.Array, vol_start: jax.Array, voxel: jax.Array,
              pos: jax.Array) -> jax.Array:
    """Trilinear sample of a volume at world positions.

    ``vol``: [X, Y, Z] or [X, Y, Z, C]; ``pos``: [..., 3].
    Mirrors ``interp_tsdf_diff/color/cnt`` (``utils.cu:99-170``) with the
    corner indices clamped to the grid (the reference reads out of bounds at
    the border — UB we do not reproduce).
    """
    dims = vol.shape[:3]
    chan = vol.shape[3:]
    idx = (pos - vol_start) / voxel
    flf = jnp.floor(idx)
    fr = idx - flf
    fl = flf.astype(jnp.int32)

    flat = vol.reshape((-1,) + chan)
    sy = dims[2]
    sx = dims[1] * dims[2]

    def corner(i, j, k):
        ci = jnp.clip(fl[..., 0] + i, 0, dims[0] - 1)
        cj = jnp.clip(fl[..., 1] + j, 0, dims[1] - 1)
        ck = jnp.clip(fl[..., 2] + k, 0, dims[2] - 1)
        return jnp.take(flat, ci * sx + cj * sy + ck, axis=0).astype(jnp.float32)

    if chan:
        fx, fy, fz = fr[..., 0:1], fr[..., 1:2], fr[..., 2:3]
    else:
        fx, fy, fz = fr[..., 0], fr[..., 1], fr[..., 2]

    def mix(a, b, t):
        return (1.0 - t) * a + t * b

    low = mix(mix(corner(0, 0, 0), corner(1, 0, 0), fx),
              mix(corner(0, 1, 0), corner(1, 1, 0), fx), fy)
    high = mix(mix(corner(0, 0, 1), corner(1, 0, 1), fx),
               mix(corner(0, 1, 1), corner(1, 1, 1), fx), fy)
    return mix(low, high, fz)


def ray_march(state: TSDFState, origins: jax.Array, dirs: jax.Array,
              cfg: FusionConfig, tmin_clip: float = 0.01,
              tmax_clip: float = 100.0):
    """March rays against the SDF. origins/dirs: [..., 3] (origins broadcast).

    Returns (hit [...], t_hit [...]) with the reference's exact stepping:
    AABB slab test (``tsdf.cu:90-101``), start at tnear+1e-6, full-voxel
    steps dropping to voxel/4 near the surface, linear zero-crossing
    refinement ``t += step * f_tt / (f_t - f_tt)`` (``tsdf.cu:103-124``).
    """
    shape = dirs.shape[:-1]
    o = jnp.broadcast_to(origins, dirs.shape).astype(jnp.float32)
    d = dirs.astype(jnp.float32)
    inv_d = 1.0 / d
    tbot = inv_d * (state.vol_start - o)
    ttop = inv_d * (state.vol_end - o)
    tnear = jnp.maximum(jnp.minimum(ttop, tbot).max(-1), tmin_clip)
    tfar = jnp.minimum(jnp.maximum(ttop, tbot).min(-1), tmax_clip) - 1e-6

    voxel0 = state.voxel[0]

    def sample(t):
        return trilinear(state.diff, state.vol_start, state.voxel,
                         o + t[..., None] * d)

    t0 = tnear + 1e-6
    f0 = sample(t0)
    # only rays that intersect the AABB and start outside the surface march
    # (f_t > 0 gate, tsdf.cu:108)
    alive0 = (tnear <= tfar) & (f0 > 0) & (t0 < tfar)

    init = dict(
        t=t0,
        f_t=f0,
        step=jnp.full(shape, voxel0),
        alive=alive0,
        hit=jnp.zeros(shape, bool),
        t_hit=jnp.zeros(shape, jnp.float32),
        i=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return jnp.any(s["alive"]) & (s["i"] < cfg.max_march_steps)

    def body(s):
        f_tt = sample(s["t"])
        hit_now = s["alive"] & (f_tt < 0.0)
        # zero-crossing refinement with the *pre-update* stepsize
        t_ref = s["t"] + s["step"] * f_tt / (s["f_t"] - f_tt)
        t_hit = jnp.where(hit_now, t_ref, s["t_hit"])
        cont = s["alive"] & ~hit_now
        step = jnp.where(cont & (f_tt < voxel0 / 2.0), voxel0 / 4.0, s["step"])
        f_t = jnp.where(cont, f_tt, s["f_t"])
        t = jnp.where(cont, s["t"] + step, s["t"])
        alive = cont & (t < tfar)
        return dict(t=t, f_t=f_t, step=step, alive=alive,
                    hit=s["hit"] | hit_now, t_hit=t_hit, i=s["i"] + 1)

    out = jax.lax.while_loop(cond, body, init)
    return out["hit"], out["t_hit"]


def camera_rays(intrinsic_inv: jax.Array, H: int, W: int):
    """Per-pixel camera-frame ray targets K^-1 @ [x, y, 1] -> [H, W, 3]."""
    xs = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None, None]
    Ki = intrinsic_inv.astype(jnp.float32)
    ones = jnp.ones((H, W, 1), jnp.float32)
    return (Ki[None, None, :3, 0] * xs + Ki[None, None, :3, 1] * ys
            + Ki[None, None, :3, 2] * ones)


@partial(jax.jit, static_argnames=("cfg", "H", "W"))
def back_project_probe(state: TSDFState, extrinsic2init: jax.Array,
                       intrinsic_inv: jax.Array, H: int, W: int,
                       cfg: FusionConfig):
    """Render what the fused model claims each pixel's instance is.

    = ``back_proj_kernel`` (``tsdf.cu:72-135``): rays from the *current*
    camera (R^T, o = -R^T t of extrinsic2init, host-side setup
    ``tsdf.cu:432-439``); at the surface hit, trilinearly sample the raw
    instance histogram into ``probs`` [H, W, K]; ``box_mask`` flags bins
    whose *raw interpolated count* exceeds 0.3 (``tsdf.cu:128`` — the
    normalization by n_obs happens later, in association).
    """
    E = extrinsic2init.astype(jnp.float32)
    R_t = E[:3, :3].T
    o = -R_t @ E[:3, 3]
    targets = camera_rays(intrinsic_inv, H, W)
    d = targets @ R_t.T  # R^T @ target per pixel
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit, t_hit = ray_march(state, o, d, cfg)
    pos = o + t_hit[..., None] * d
    cnts = trilinear(state.hist, state.vol_start, state.voxel, pos)
    probs = jnp.where(hit[..., None], cnts, 0.0)
    box_mask = probs > cfg.box_mask_thresh
    return probs, box_mask


def orbit_camera(angle, dist):
    """Orbit extrinsic + camera center of the reference viewer
    (``viewer.cu:140-146``)."""
    angle = jnp.asarray(angle, jnp.float32)
    dist = jnp.asarray(dist, jnp.float32)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                    jnp.float32)
    rot = rot.at[0, 0].set(ca).at[0, 2].set(-sa).at[0, 3].set(dist * sa)
    rot = rot.at[2, 0].set(sa).at[2, 2].set(ca).at[2, 3].set(dist - dist * ca)
    c = jnp.stack([(dist + 0.5) * sa, jnp.zeros_like(dist),
                   (dist + 0.5) - (dist + 0.5) * ca])
    return rot, c


@partial(jax.jit, static_argnames=("cfg", "H", "W", "mode"))
def render(state: TSDFState, s2w: jax.Array, center: jax.Array,
           H: int, W: int, cfg: FusionConfig, mode: str = "instance"):
    """Raycast render. = ``show_tsdf_kernel`` (``viewer.cu:17-86``).

    mode="instance": argmax of the trilinear instance histogram at the hit,
    colored by the fixed palette, background black, instance 0 black
    (``viewer.cu:69-83``). mode="color": the commented-out RGB path
    (``viewer.cu:68``). Returns uint8 [H, W, 3] RGB.
    """
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    S = s2w.astype(jnp.float32)
    ones = jnp.ones((H, W), jnp.float32)
    target = jnp.stack([S[r, 0] * xs + S[r, 1] * ys + S[r, 2] + S[r, 3]
                        for r in range(3)], axis=-1)
    d = target - center
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit, t_hit = ray_march(state, center, d, cfg)
    pos = center + t_hit[..., None] * d
    if mode == "color":
        rgb = trilinear(state.color.astype(jnp.float32), state.vol_start,
                        state.voxel, pos)
        img = jnp.where(hit[..., None], rgb, 0.0).astype(jnp.uint8)
        return img
    cnts = trilinear(state.hist, state.vol_start, state.voxel, pos)
    # argmax with >0 gate: obj 0 (background bin) stays black (viewer.cu:71-83)
    obj = jnp.argmax(cnts, axis=-1)
    max_cnt = jnp.max(cnts, axis=-1)
    visible = hit & (obj > 0) & (max_cnt > 0)
    img = jnp.where(visible[..., None], jnp.asarray(INSTANCE_PALETTE)[obj], 0)
    return img.astype(jnp.uint8)


def render_orbit(state: TSDFState, angle, dist, intrinsic_inv: jax.Array,
                 H: int, W: int, cfg: FusionConfig, mode: str = "instance"):
    """= ``Viewer::show_tsdf`` (``viewer.cu:137-166``): orbit camera at
    ``angle`` / ``dist`` (the reference passes dist = first-frame mean
    depth, ``kernel.cpp:105``), s2w = rot @ K^-1."""
    rot, c = orbit_camera(angle, dist)
    s2w = rot @ intrinsic_inv.astype(jnp.float32)
    return render(state, s2w, c, H, W, cfg, mode)
