"""TSDF fusion update — voxel-parallel gather formulation.

TPU-native re-design of ``tsdf_kernel`` (reference
``src/SfM_CUDA/tsdf.cu:18-70``). The reference is already voxel-parallel
(one CUDA thread per voxel *gathers* its pixel — no scatter, no races);
we keep that shape: every voxel projects into the camera, gathers
depth/color/mask at the nearest pixel, and blends. On TPU this is one fused
elementwise+gather XLA program over the [X, Y, Z] grid; the instance
histogram update is a one-hot add over the K lanes (K = 32 = a quarter of a
VPU lane group), which XLA fuses into the same pass.

Parity choices preserved (each cited):
* nearest-pixel lookup via floor — bilinear is an unimplemented TODO in the
  reference (``tsdf.cu:42-44``).
* depth/5000 TUM scaling (``tsdf.cu:49``).
* cull at ``diff <= -mu``; clamp above at +mu; normalize by mu
  (``tsdf.cu:50-52``).
* color + histogram only update when normalized diff < 0.99
  (``tsdf.cu:57-62``); SDF and weight update regardless.
* color blend in integer arithmetic with truncation (uint8 running mean,
  ``tsdf.cu:59``).
* weight increments by 1 *after* the blends (``tsdf.cu:68``), i.e. blends
  use the pre-update weight.

Deliberate deviation from the reference: voxels BEHIND the camera plane
(camera z <= 0) never fuse. The CUDA kernel (``tsdf.cu:30-52``) has no
z-guard, so a behind-camera voxel whose mirrored projection lands in-bounds
is marked "observed empty" (diff clamps to +mu, weight++) — geometric
nonsense that only manifests when the camera enters the volume. Both our
paths (this one and ``ops/pallas/fuse_kernel.py``) apply the z > 0 guard
and are tested to agree with each other for cameras inside the volume
(``tests/test_fuse_pallas.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from slam_maskrcnn_tpu.fusion.state import FusionConfig, TSDFState


def _voxel_camera_coords(state: TSDFState, extrinsic2init: jax.Array,
                         dim: tuple[int, int, int]):
    """Project every voxel center into the camera frame.

    Returns (proj_x, proj_y, proj_z) each broadcastable to [X, Y, Z].
    Positions are computed from per-axis 1D iotas so XLA never materializes
    an [X, Y, Z, 3] position tensor.
    """
    E = extrinsic2init.astype(jnp.float32)
    xs = (state.vol_start[0] + jnp.arange(dim[0], dtype=jnp.float32) * state.voxel[0])[:, None, None]
    ys = (state.vol_start[1] + jnp.arange(dim[1], dtype=jnp.float32) * state.voxel[1])[None, :, None]
    zs = (state.vol_start[2] + jnp.arange(dim[2], dtype=jnp.float32) * state.voxel[2])[None, None, :]
    proj = []
    for r in range(3):
        proj.append(E[r, 0] * xs + E[r, 1] * ys + E[r, 2] * zs + E[r, 3])
    return proj[0], proj[1], proj[2]


@partial(jax.jit, static_argnames=("cfg",))
def fuse_frame(state: TSDFState, depth: jax.Array, color: jax.Array,
               mask: jax.Array, extrinsic2init: jax.Array,
               intrinsic: jax.Array, cfg: FusionConfig) -> TSDFState:
    """Fuse one RGB-D(+mask) frame into the volume.

    Args:
      state: current TSDFState.
      depth: uint16 [H, W] raw TUM depth (0 = invalid).
      color: uint8 [H, W, 3] image (BGR, as the reference's cv::imread).
      mask:  uint8 [H, W] label-encoded instance mask (0 = background),
             already relabeled to global ids by the association step.
      extrinsic2init: f32 [4, 4] world->camera of this frame composed with
             the first frame's camera->world (``extrinsic * init_extrinsic_inv``,
             ``tsdf.cu:217``).
      intrinsic: f32 [4, 4].
      cfg: static FusionConfig.
    """
    dim = cfg.vol_dim
    H, W = depth.shape
    K = intrinsic.astype(jnp.float32)

    px, py, pz = _voxel_camera_coords(state, extrinsic2init, dim)
    # screen = K[:3,:3] @ proj ; reference tsdf.cu:35-40
    screen_x = K[0, 0] * px + K[0, 1] * py + K[0, 2] * pz
    screen_y = K[1, 0] * px + K[1, 1] * py + K[1, 2] * pz
    screen_z = K[2, 0] * px + K[2, 1] * py + K[2, 2] * pz
    u = jnp.floor(screen_x / screen_z).astype(jnp.int32)
    v = jnp.floor(screen_y / screen_z).astype(jnp.int32)

    # pz > 0: cull behind-camera voxels (deliberate deviation, see module
    # docstring; keeps parity with the Pallas kernel's in_img test)
    in_bounds = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (pz > 0)
    uc = jnp.clip(u, 0, W - 1)
    vc = jnp.clip(v, 0, H - 1)
    flat_idx = vc * W + uc

    d_raw = jnp.take(depth.reshape(-1), flat_idx, axis=0)
    depth_m = d_raw.astype(jnp.float32) / cfg.depth_scale
    mu = state.mu
    diff_m = depth_m - pz
    valid = in_bounds & (d_raw > 0) & (diff_m > -mu)  # cull: tsdf.cu:48,50
    diff_n = jnp.minimum(diff_m, mu) / mu             # clamp+normalize: tsdf.cu:51-52

    wt = state.weight.astype(jnp.float32)
    new_diff = jnp.where(valid, (state.diff * wt + diff_n) / (wt + 1.0), state.diff)

    gate = valid & (diff_n < cfg.color_diff_gate)     # tsdf.cu:57

    # color: integer truncating running mean, uint8 (tsdf.cu:58-60)
    c_pix = jnp.take(color.reshape(-1, 3), flat_idx, axis=0)  # u8 [X,Y,Z,3]
    wt_i = state.weight[..., None]
    blended = (state.color.astype(jnp.int32) * wt_i + c_pix.astype(jnp.int32)) // (wt_i + 1)
    new_color = jnp.where(gate[..., None], blended.astype(jnp.uint8), state.color)

    m_pix = jnp.take(mask.reshape(-1), flat_idx, axis=0).astype(jnp.int32)
    m_pix = jnp.clip(m_pix, 0, cfg.max_objects - 1)

    if cfg.majority_vote:
        # Boyer-Moore majority mode of the TSDF_Python prototype
        # (src/TSDF_Python/tsdf.cu:48-57): same id -> cnt++, different with
        # cnt>0 -> cnt--, cnt==0 -> adopt new id with cnt=1.
        same = state.mv_id == m_pix
        cnt = state.mv_cnt
        new_cnt = jnp.where(same, cnt + 1, jnp.where(cnt > 0, cnt - 1, 1))
        new_id = jnp.where(same | (cnt > 0), state.mv_id, m_pix)
        mv_cnt = jnp.where(gate, new_cnt, cnt)
        mv_id = jnp.where(gate, new_id, state.mv_id)
        new_hist = state.hist
    else:
        onehot = (m_pix[..., None] == jnp.arange(cfg.max_objects, dtype=jnp.int32)) & gate[..., None]
        new_hist = state.hist + onehot.astype(state.hist.dtype)
        mv_id, mv_cnt = state.mv_id, state.mv_cnt

    new_weight = state.weight + valid.astype(jnp.int32)  # tsdf.cu:68

    return state.replace(
        diff=new_diff,
        color=new_color,
        weight=new_weight,
        hist=new_hist,
        mv_id=mv_id,
        mv_cnt=mv_cnt,
        n_obs=state.n_obs + 1,
    )
