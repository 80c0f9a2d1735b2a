"""NumPy oracle for the fusion + raycast math.

A deliberately literal, loop-based transcription of the reference CUDA
semantics (``src/SfM_CUDA/tsdf.cu:18-70`` fusion, ``utils.cu:99-170``
trilinear interpolation, ``tsdf.cu:72-135`` / ``viewer.cu:17-86`` ray
march), used ONLY in tests at tiny volume sizes as the golden reference for
the vectorized JAX implementations. The reference keeps its own prototype
chain as the oracle (SURVEY §4.5: TSDF_CPP -> TSDF_Python numpy spec at
``src/TSDF_Python/tsdf.py:78-175`` -> SfM_CUDA); this file plays that role
for us with real asserts instead of cv::imshow.

Slow on purpose. Do not use outside tests.
"""

from __future__ import annotations

import numpy as np


def fuse_frame_ref(diff, color, weight, hist, vol_start, voxel, mu,
                   depth, image, mask, extrinsic2init, intrinsic,
                   depth_scale=5000.0, color_diff_gate=0.99):
    """Vectorized-numpy mirror of tsdf_kernel — structured like the
    reference's own commented pure-NumPy spec (src/TSDF_Python/tsdf.py:78-175):
    build the full voxel position grid, project, gather, masked-assign.
    float32 math, integer-truncating color blend. Returns updated copies."""
    diff = diff.copy()
    color = color.copy()
    weight = weight.copy()
    hist = hist.copy()
    X, Y, Z = diff.shape
    K = hist.shape[-1]
    H, W = depth.shape
    E = np.asarray(extrinsic2init, np.float32)
    Kmat = np.asarray(intrinsic, np.float32)

    grid = np.stack(np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                                indexing="ij"), -1).astype(np.float32)
    pos = np.asarray(vol_start, np.float32) + grid * np.asarray(voxel, np.float32)
    pos_h = np.concatenate([pos, np.ones((X, Y, Z, 1), np.float32)], -1)
    proj = pos_h @ E[:3].T                       # [X,Y,Z,3] camera frame
    screen = proj @ Kmat[:3, :3].T
    x = np.floor(screen[..., 0] / screen[..., 2]).astype(np.int64)
    y = np.floor(screen[..., 1] / screen[..., 2]).astype(np.int64)

    # pz > 0: behind-camera guard — a deliberate deviation from tsdf.cu
    # (which has none and would fuse mirrored projections); matches
    # fusion/fuse.py and the Pallas kernel, see fuse.py module docstring.
    inb = (x >= 0) & (x < W) & (y >= 0) & (y < H) & (proj[..., 2] > 0)
    xc, yc = np.clip(x, 0, W - 1), np.clip(y, 0, H - 1)
    d_raw = depth[yc, xc]
    mu = np.float32(mu)
    d = (d_raw / np.float32(depth_scale)).astype(np.float32) - proj[..., 2]
    valid = inb & (d_raw > 0) & (d > -mu)
    d = (np.minimum(d, mu) / mu).astype(np.float32)

    wt = weight.astype(np.float32)
    diff[valid] = ((diff * wt + d) / (wt + 1))[valid]

    gate = valid & (d < color_diff_gate)
    img_px = image[yc, xc]                       # [X,Y,Z,3] uint8
    wt_i = weight[..., None].astype(np.int64)
    blended = (color.astype(np.int64) * wt_i + img_px) // (wt_i + 1)
    color[gate] = blended.astype(np.uint8)[gate]

    m_px = np.minimum(mask[yc, xc].astype(np.int64), K - 1)
    onehot = (m_px[..., None] == np.arange(K)) & gate[..., None]
    hist += onehot.astype(hist.dtype)

    weight[valid] += 1
    return diff, color, weight, hist


def _mix(a, b, t):
    return (1.0 - t) * a + t * b


def interp_ref(pos, vol_start, voxel, vol, clamp=True):
    """Trilinear interpolation mirror of interp_tsdf_diff/cnt
    (``utils.cu:99-170``). `vol` is [X,Y,Z] or [X,Y,Z,K].

    The reference does no bounds clamping (it reads OOB device memory at
    the volume border — UB). We clamp the 8-corner indices to the valid
    range; tests only probe interior points where the two agree.
    """
    idx = (np.asarray(pos, np.float64) - np.asarray(vol_start)) / np.asarray(voxel)
    fl = np.floor(idx).astype(int)
    fr = idx - fl
    dims = vol.shape[:3]
    corners = np.empty((2, 2, 2) + vol.shape[3:], np.float64)
    for i in range(2):
        for j in range(2):
            for k in range(2):
                ci = fl + np.array([i, j, k])
                if clamp:
                    ci = np.clip(ci, 0, np.array(dims) - 1)
                corners[i, j, k] = vol[ci[0], ci[1], ci[2]]
    low = _mix(_mix(corners[0, 0, 0], corners[1, 0, 0], fr[0]),
               _mix(corners[0, 1, 0], corners[1, 1, 0], fr[0]), fr[1])
    high = _mix(_mix(corners[0, 0, 1], corners[1, 0, 1], fr[0]),
                _mix(corners[0, 1, 1], corners[1, 1, 1], fr[0]), fr[1])
    return _mix(low, high, fr[2])


def ray_march_ref(o, d, vol_start, vol_end, voxel, diff,
                  tmin_clip=0.01, tmax_clip=100.0):
    """Single-ray march mirror of back_proj_kernel/show_tsdf_kernel
    (``tsdf.cu:90-124``, ``viewer.cu:33-67``). Returns (hit, t_hit)."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    inv_d = 1.0 / d
    tbot = inv_d * (np.asarray(vol_start) - o)
    ttop = inv_d * (np.asarray(vol_end) - o)
    tnear = max(np.minimum(ttop, tbot).max(), tmin_clip)
    tfar = min(np.maximum(ttop, tbot).min(), tmax_clip)
    if tnear > tfar:
        return False, 0.0
    t = tnear + 1e-6
    tfar = tfar - 1e-6
    f_tt = 0.0
    stepsize = voxel[0]
    f_t = interp_ref(o + t * d, vol_start, voxel, diff)
    if f_t <= 0:
        return False, 0.0
    while t < tfar:
        f_tt = interp_ref(o + t * d, vol_start, voxel, diff)
        if f_tt < 0.0:
            break
        if f_tt < voxel[0] / 2.0:
            stepsize = voxel[0] / 4.0
        f_t = f_tt
        t += stepsize
    if f_tt < 0.0:
        t += stepsize * f_tt / (f_t - f_tt)
        return True, t
    return False, 0.0
