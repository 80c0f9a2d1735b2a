"""Pallas fusion kernel vs the XLA reference implementation (interpret mode
on CPU; the same test runs compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from slam_maskrcnn_tpu.fusion import FusionConfig, fuse_frame, init_from_first_frame
from slam_maskrcnn_tpu.fusion.state import make_intrinsic
from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (fuse_frame_blocked,
                                                      to_blocked, to_dense)
from slam_maskrcnn_tpu.data.synthetic import default_scene, render_frame, identity_pose_sequence

H, W = 120, 160
K4 = make_intrinsic(130.0, 130.0, W / 2, H / 2)
CFG = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16,
                   pallas_rect=(128, 256))


def _frames(n=3):
    scene = default_scene()
    out = []
    for E in identity_pose_sequence(n):
        d, c, m = render_frame(scene, E, K4, H, W)
        out.append((d, c, m, E))
    return out


def test_blocked_roundtrip():
    frames = _frames(1)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    state = init_from_first_frame(CFG, depth0, K4, md)
    b = to_blocked(state, CFG)
    back = to_dense(b, CFG)
    np.testing.assert_array_equal(np.asarray(back.diff),
                                  np.asarray(state.diff))
    np.testing.assert_array_equal(np.asarray(back.color),
                                  np.asarray(state.color))
    np.testing.assert_array_equal(np.asarray(back.hist).astype(np.uint16),
                                  np.asarray(state.hist))


def test_pallas_fuse_matches_xla():
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    state = init_from_first_frame(CFG, depth0, K4, md)
    blocked = to_blocked(state, CFG)
    E0inv = np.linalg.inv(frames[0][3])

    for depth, img, mask, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        state = fuse_frame(state, jnp.asarray(depth), jnp.asarray(img),
                           jnp.asarray(mask), e2i, jnp.asarray(K4), CFG)
        blocked, miss = fuse_frame_blocked(
            blocked, jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
            e2i, jnp.asarray(K4), CFG)
        assert int(miss) == 0, "rect missed voxels"

    dense = to_dense(blocked, CFG)
    np.testing.assert_array_equal(np.asarray(dense.weight),
                                  np.asarray(state.weight))
    np.testing.assert_array_equal(np.asarray(dense.hist),
                                  np.asarray(state.hist))
    np.testing.assert_array_equal(np.asarray(dense.color),
                                  np.asarray(state.color))
    bad = ~np.isclose(np.asarray(dense.diff), np.asarray(state.diff),
                      atol=1e-5)
    assert bad.mean() < 5e-4, f"{bad.sum()} voxel diffs mismatch"
    assert int(dense.n_obs) == int(state.n_obs)


def test_u8_hist_mode_matches_u16():
    """hist_dtype=uint8 halves histogram traffic; counts must agree with
    the u16 mode exactly (saturation unreachable at 3 frames)."""
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        init_blocked_from_first_frame)

    cfg8 = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint8,
                        pallas_rect=(128, 256))
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    b16 = init_blocked_from_first_frame(CFG, depth0, K4, md)
    b8 = init_blocked_from_first_frame(cfg8, depth0, K4, md)
    assert b8.hist.dtype == jnp.uint8
    E0inv = np.linalg.inv(frames[0][3])
    for depth, img, mask, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
                e2i, jnp.asarray(K4))
        b16, m16 = fuse_frame_blocked(b16, *args, CFG)
        b8, m8 = fuse_frame_blocked(b8, *args, cfg8)
        assert int(m16) == 0 and int(m8) == 0
    np.testing.assert_array_equal(
        np.asarray(b8.hist).astype(np.uint16), np.asarray(b16.hist))
    np.testing.assert_array_equal(np.asarray(b8.weight),
                                  np.asarray(b16.weight))
    np.testing.assert_array_equal(np.asarray(b8.diff), np.asarray(b16.diff))


def test_init_blocked_matches_conversion():
    from slam_maskrcnn_tpu.fusion.state import init_state
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import init_blocked

    dense = init_state(CFG, [-0.5, -0.5, 0.5], [0.5, 0.5, 1.5])
    via_conv = to_blocked(dense, CFG)
    direct = init_blocked(CFG, [-0.5, -0.5, 0.5], [0.5, 0.5, 1.5])
    np.testing.assert_array_equal(np.asarray(direct.diff),
                                  np.asarray(via_conv.diff))
    np.testing.assert_array_equal(np.asarray(direct.hist),
                                  np.asarray(via_conv.hist))
    np.testing.assert_allclose(np.asarray(direct.voxel),
                               np.asarray(via_conv.voxel))
    assert (direct.nbx, direct.nby, direct.nbz) == (
        via_conv.nbx, via_conv.nby, via_conv.nbz)


def test_camera_inside_volume_parity():
    """Camera at the volume center (blocks straddle the camera plane).
    Straddling/near blocks route to the full-image-rect pass B, so the
    result must now FULLY match the exact XLA path with zero misses (both
    paths apply the pz > 0 guard, see fuse.py)."""
    frames = _frames(1)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    state = init_from_first_frame(CFG, depth0, K4, md)
    blocked = to_blocked(state, CFG)

    # extrinsic that puts the camera at the volume center, looking +z
    center = 0.5 * (np.asarray(state.vol_start) + np.asarray(state.vol_end))
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = -center
    depth, img, mask = (jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]),
                        jnp.asarray(frames[0][2]))
    xla = fuse_frame(state, depth, img, mask, jnp.asarray(E),
                     jnp.asarray(K4), CFG)
    pal, miss = fuse_frame_blocked(blocked, depth, img, mask,
                                   jnp.asarray(E), jnp.asarray(K4), CFG)
    dense = to_dense(pal, CFG)

    assert int(miss) == 0, f"pass B should leave no misses, got {int(miss)}"
    w0 = np.asarray(state.weight)
    dw_xla = np.asarray(xla.weight) - w0
    dw_pal = np.asarray(dense.weight) - w0
    assert dw_xla.sum() > 0, "fixture must actually fuse something"
    np.testing.assert_array_equal(dw_pal, dw_xla)
    # wherever updated, the paths agree (a handful of voxels sit exactly
    # on the color-gate/cull thresholds where the two paths' float
    # summation orders differ — same tolerance class as the main test)
    upd = dw_pal > 0
    hist_bad = (np.asarray(dense.hist)[upd]
                != np.asarray(xla.hist)[upd]).any(-1)
    assert hist_bad.mean() < 5e-3, f"{hist_bad.sum()} hist mismatches"
    diff_bad = ~np.isclose(np.asarray(dense.diff)[upd],
                           np.asarray(xla.diff)[upd], atol=1e-5)
    assert diff_bad.mean() < 1e-2, f"{diff_bad.sum()} diff mismatches"


def test_sparse_main_pass_matches_dense():
    """pallas_sparse=True (one compacted pass over the non-identity
    blocks, identity blocks untouched) must reproduce the dense-grid
    kernel bit-exactly — the free/full branches are the SAME kernel code
    either way."""
    cfg_s = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256), pallas_sparse=True)
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    # two independent states: donation on the first fuse call would
    # otherwise delete the metadata arrays they'd share
    b_d = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    b_s = to_blocked(init_from_first_frame(cfg_s, depth0, K4, md), cfg_s)
    E0inv = np.linalg.inv(frames[0][3])
    for depth, img, mask, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
                e2i, jnp.asarray(K4))
        b_d, m_d = fuse_frame_blocked(b_d, *args, CFG)
        b_s, m_s = fuse_frame_blocked(b_s, *args, cfg_s)
        assert int(m_d) == 0 and int(m_s) == 0
    np.testing.assert_array_equal(np.asarray(b_s.weight),
                                  np.asarray(b_d.weight))
    np.testing.assert_array_equal(np.asarray(b_s.hist),
                                  np.asarray(b_d.hist))
    np.testing.assert_array_equal(np.asarray(b_s.colorpk),
                                  np.asarray(b_d.colorpk))
    np.testing.assert_array_equal(np.asarray(b_s.diff),
                                  np.asarray(b_d.diff))


def test_sparse_state_hbm_matches_dense():
    """pallas_sparse + pallas_state_hbm=True — the pairing the config
    docs recommend (HBM-resident diff/colorpk/weight with true-id manual
    DMA inside the compacted pass) — must also be bit-exact vs the dense
    grid (ADVICE r3: these kernel branches shipped untested)."""
    cfg_s = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256), pallas_sparse=True,
                         pallas_state_hbm=True)
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    b_d = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    b_s = to_blocked(init_from_first_frame(cfg_s, depth0, K4, md), cfg_s)
    E0inv = np.linalg.inv(frames[0][3])
    for depth, img, mask, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
                e2i, jnp.asarray(K4))
        b_d, m_d = fuse_frame_blocked(b_d, *args, CFG)
        b_s, m_s = fuse_frame_blocked(b_s, *args, cfg_s)
        assert int(m_d) == 0 and int(m_s) == 0
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(np.asarray(getattr(b_s, f)),
                                      np.asarray(getattr(b_d, f)))


def test_sparse_budget_overflow_counts_misses():
    """Visible blocks beyond vis_block_budget must be counted into the
    miss channel as whole blocks (the no-silent-caps contract)."""
    # 64^3 = 128 blocks (a 32^3 volume has only 16 = the budget itself)
    cfg_s = FusionConfig(vol_dim=(64, 64, 64), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256), pallas_sparse=True,
                         vis_block_budget=16)
    frames = _frames(1)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    state = init_from_first_frame(cfg_s, depth0, K4, md)
    b_s = to_blocked(state, cfg_s)
    E0inv = np.linalg.inv(frames[0][3])
    depth, img, mask, E = frames[0]
    e2i = jnp.asarray((E @ E0inv).astype(np.float32))
    b_s, m_s = fuse_frame_blocked(b_s, jnp.asarray(depth), jnp.asarray(img),
                                  jnp.asarray(mask), e2i, jnp.asarray(K4),
                                  cfg_s)
    # the 32^3 fixture has far more than 16 visible blocks
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import BLOCK_VOX
    assert int(m_s) >= BLOCK_VOX, f"expected whole-block misses, got {m_s}"


def test_compact_grid_matches_dense():
    """pallas_compact=True (index_map-driven compacted streamed grid:
    one grid step per non-identity block run, identity runs never
    streamed, padding steps pointed at an all-identity run) must be
    bit-exact vs the dense grid at every run granularity, including
    grp=16 where runs coincide with the dense GROUP slabs and grp=1
    where only non-identity blocks stream."""
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    E0inv = np.linalg.inv(frames[0][3])
    for grp in (1, 4, 16):
        cfg_c = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16,
                             pallas_rect=(128, 256), pallas_compact=True,
                             pallas_compact_grp=grp,
                             # budget 12 blocks-worth of runs < the 16
                             # blocks of a 32^3 volume at grp=1: forces
                             # live padding steps at every grp
                             vis_block_budget=12 if grp == 1 else 16384)
        b_d = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
        b_c = to_blocked(init_from_first_frame(cfg_c, depth0, K4, md),
                         cfg_c)
        m_c_last = 0
        for depth, img, mask, E in frames:
            e2i = jnp.asarray((E @ E0inv).astype(np.float32))
            args = (jnp.asarray(depth), jnp.asarray(img),
                    jnp.asarray(mask), e2i, jnp.asarray(K4))
            b_d, m_d = fuse_frame_blocked(b_d, *args, CFG)
            b_c, m_c = fuse_frame_blocked(b_c, *args, cfg_c)
            assert int(m_d) == 0
            m_c_last = int(m_c)
        if grp == 1 and m_c_last > 0:
            # the tight budget may overflow on this fixture — then the
            # miss channel must say so and the comparison is waived
            from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import BLOCK_VOX
            assert m_c_last >= BLOCK_VOX
            continue
        for f in ("weight", "hist", "colorpk", "diff"):
            np.testing.assert_array_equal(
                np.asarray(getattr(b_c, f)), np.asarray(getattr(b_d, f)),
                err_msg=f"compact grp={grp} field {f}")


def test_visit_compact_matches_dense():
    """pallas_visit_compact (per-group compacted non-identity lane lists
    + whole-group bulk identity commit on the dense streamed grid) must
    be bit-exact vs the dense visit loop. 64^3 gives NB=128 so the
    mode's NB % 128 gate actually engages (32^3 would silently fall
    back); group=8 is an even divisor of 128, and an odd-count group
    exercises the packed 16-bit lane list's high-half decode."""
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    cfg_d = FusionConfig(vol_dim=(64, 64, 64), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256), pallas_group=8,
                         pallas_visit_compact=False)
    cfg_v = FusionConfig(vol_dim=(64, 64, 64), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256), pallas_group=8,
                         pallas_visit_compact=True)
    b_d = to_blocked(init_from_first_frame(cfg_d, depth0, K4, md), cfg_d)
    b_v = to_blocked(init_from_first_frame(cfg_v, depth0, K4, md), cfg_v)
    E0inv = np.linalg.inv(frames[0][3])
    for depth, img, mask, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
                e2i, jnp.asarray(K4))
        b_d, m_d = fuse_frame_blocked(b_d, *args, cfg_d)
        b_v, m_v = fuse_frame_blocked(b_v, *args, cfg_v)
        assert int(m_d) == int(m_v) == 0
    assert int(jnp.sum(b_d.weight)) > 0, "fixture must fuse something"
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b_v, f)), np.asarray(getattr(b_d, f)),
            err_msg=f"visit_compact field {f}")


def test_compact_budget_overflow_counts_misses():
    """Non-identity runs beyond vis_block_budget must land in the miss
    channel as whole blocks (the no-silent-caps contract)."""
    cfg_c = FusionConfig(vol_dim=(64, 64, 64), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256), pallas_compact=True,
                         pallas_compact_grp=1, vis_block_budget=16)
    frames = _frames(1)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    b_c = to_blocked(init_from_first_frame(cfg_c, depth0, K4, md), cfg_c)
    E0inv = np.linalg.inv(frames[0][3])
    depth, img, mask, E = frames[0]
    e2i = jnp.asarray((E @ E0inv).astype(np.float32))
    b_c, m_c = fuse_frame_blocked(b_c, jnp.asarray(depth), jnp.asarray(img),
                                  jnp.asarray(mask), e2i, jnp.asarray(K4),
                                  cfg_c)
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import BLOCK_VOX
    assert int(m_c) >= BLOCK_VOX, f"expected whole-block misses, got {m_c}"


def test_merged_mid_tier_matches_separate_pass():
    """merge_mid (frame_vmem): blocks exceeding the pass-A rect fuse
    inside pass A through a (mid_h, mid_w) window (vis code 3) instead
    of the separate compacted mid pass. A tiny pass-A rect forces most
    blocks into the mid tier; results must be bit-exact vs the
    separate-pass path (pallas_frame_vmem=False) and match the XLA
    oracle within the main test's tolerance."""
    kw = dict(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16,
              pallas_rect=(16, 128), pallas_rect_mid=(128, 256))
    cfg_m = FusionConfig(**kw)                         # merged (default)
    cfg_p = FusionConfig(**kw, pallas_frame_vmem=False)  # separate pass M
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())

    # the fixture must actually exercise the merged tier
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import _block_origins
    b0 = to_blocked(init_from_first_frame(cfg_m, depth0, K4, md), cfg_m)
    E0inv = np.linalg.inv(frames[0][3])
    e2i0 = jnp.asarray((frames[0][3] @ E0inv).astype(np.float32))
    origins, _fm, _ff, _om = _block_origins(
        b0, e2i0, jnp.asarray(K4), 128, 256, 16, 128, img_h=H, img_w=W,
        rect_mid=(128, 256), merge_mid=True)
    codes = np.asarray(origins) & 3  # packed origins: code in bits 0-1
    assert (codes == 3).sum() > 0, "fixture exercises no mid-tier blocks"

    xla = init_from_first_frame(cfg_m, depth0, K4, md)
    b_m = to_blocked(init_from_first_frame(cfg_m, depth0, K4, md), cfg_m)
    b_p = to_blocked(init_from_first_frame(cfg_p, depth0, K4, md), cfg_p)
    for depth, img, mask, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
                e2i, jnp.asarray(K4))
        xla = fuse_frame(xla, *args, cfg_m)
        b_m, m_m = fuse_frame_blocked(b_m, *args, cfg_m)
        b_p, m_p = fuse_frame_blocked(b_p, *args, cfg_p)
        assert int(m_m) == 0 and int(m_p) == 0
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b_m, f)), np.asarray(getattr(b_p, f)),
            err_msg=f"merged vs separate pass M: {f}")
    dense = to_dense(b_m, cfg_m)
    np.testing.assert_array_equal(np.asarray(dense.weight),
                                  np.asarray(xla.weight))
    np.testing.assert_array_equal(np.asarray(dense.hist),
                                  np.asarray(xla.hist))
    bad = ~np.isclose(np.asarray(dense.diff), np.asarray(xla.diff),
                      atol=1e-5)
    assert bad.mean() < 5e-4


def test_group_knob_matches_default():
    """pallas_group (dense-grid blocks per step) must not change values."""
    cfg_g = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256), pallas_group=4)
    frames = _frames(2)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    b_d = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    b_g = to_blocked(init_from_first_frame(cfg_g, depth0, K4, md), cfg_g)
    E0inv = np.linalg.inv(frames[0][3])
    for depth, img, mask, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
                e2i, jnp.asarray(K4))
        b_d, m_d = fuse_frame_blocked(b_d, *args, CFG)
        b_g, m_g = fuse_frame_blocked(b_g, *args, cfg_g)
        assert int(m_d) == 0 and int(m_g) == 0
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(np.asarray(getattr(b_g, f)),
                                      np.asarray(getattr(b_d, f)))


def test_banded_rect_matches_plain():
    """pallas_banded_rect=True (both packed tables in ONE 8-row-banded
    DMA per block) must be bit-exact vs the two-copy layout, including
    the camera-inside pass-B path."""
    cfg_b = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256), pallas_banded_rect=True)
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    b_p = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    b_b = to_blocked(init_from_first_frame(cfg_b, depth0, K4, md), cfg_b)
    E0inv = np.linalg.inv(frames[0][3])
    poses = [jnp.asarray((E @ E0inv).astype(np.float32))
             for *_ignore, E in frames]
    # last frame: camera at the volume center (pass-B straddlers)
    center = 0.5 * (np.asarray(b_p.vol_start) + np.asarray(b_p.vol_end))
    Ein = np.eye(4, dtype=np.float32)
    Ein[:3, 3] = -center
    poses[-1] = jnp.asarray(Ein)
    for (depth, img, mask, _E), e2i in zip(frames, poses):
        args = (jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
                e2i, jnp.asarray(K4))
        b_p, m_p = fuse_frame_blocked(b_p, *args, CFG)
        b_b, m_b = fuse_frame_blocked(b_b, *args, cfg_b)
        assert int(m_p) == int(m_b) == 0
    np.testing.assert_array_equal(np.asarray(b_b.weight),
                                  np.asarray(b_p.weight))
    np.testing.assert_array_equal(np.asarray(b_b.hist),
                                  np.asarray(b_p.hist))
    np.testing.assert_array_equal(np.asarray(b_b.colorpk),
                                  np.asarray(b_p.colorpk))
    np.testing.assert_array_equal(np.asarray(b_b.diff),
                                  np.asarray(b_p.diff))


def test_invisible_blocks_are_skipped_correctly():
    """Camera looking away: no voxel is visible; the state must be
    unchanged except n_obs (identity update via the visibility skip)."""
    frames = _frames(1)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    state = init_from_first_frame(CFG, depth0, K4, md)
    blocked = to_blocked(state, CFG)
    # rotate the camera 180 degrees: volume is behind it
    E = np.eye(4, dtype=np.float32)
    E[0, 0] = E[2, 2] = -1.0
    b2, miss = fuse_frame_blocked(
        blocked, jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]),
        jnp.asarray(frames[0][2]), jnp.asarray(E), jnp.asarray(K4), CFG)
    assert int(miss) == 0
    blocked_ref = to_blocked(state, CFG)  # fresh copy (donation consumed it)
    np.testing.assert_array_equal(np.asarray(b2.weight),
                                  np.asarray(blocked_ref.weight))
    np.testing.assert_array_equal(np.asarray(b2.hist),
                                  np.asarray(blocked_ref.hist))
    np.testing.assert_allclose(np.asarray(b2.diff),
                               np.asarray(blocked_ref.diff))


def test_tight_tier_fast_path_exercised_and_exact():
    """The frame_vmem tight-window tiers ((32, 128) / (rect_h, 128)) are
    sized for PRODUCTION footprints — at the coarse volumes the other
    tests use, block footprints exceed them and only the fallback body
    runs. This fixture makes blocks fine enough (128x128x64 voxels,
    240x320 image) that the fast tiers genuinely execute, asserts so by
    replicating the tier-1 dispatch test host-side, and checks the
    result is bit-identical to the DMA fallback path
    (pallas_frame_vmem=False) AND to the exact XLA oracle."""
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import BX, BY, BZ

    Ht, Wt = 240, 320
    Kt = make_intrinsic(260.0, 260.0, Wt / 2, Ht / 2)
    kw = dict(vol_dim=(128, 128, 64), hist_dtype=jnp.uint16,
              pallas_rect=(48, 256), pallas_rect_mid=(128, 384))
    cfg_fv = FusionConfig(pallas_frame_vmem=True, **kw)
    cfg_dma = FusionConfig(pallas_frame_vmem=False, **kw)
    scene = default_scene()
    frames = []
    for E in identity_pose_sequence(2):
        d, c, m = render_frame(scene, E, Kt, Ht, Wt)
        frames.append((d, c, m, E))
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())

    b_fv = to_blocked(init_from_first_frame(cfg_fv, depth0, Kt, md),
                      cfg_fv)
    b_dma = to_blocked(init_from_first_frame(cfg_dma, depth0, Kt, md),
                       cfg_dma)
    xla = init_from_first_frame(cfg_fv, depth0, Kt, md)
    E0inv = np.linalg.inv(frames[0][3])
    Ktj = jnp.asarray(Kt)
    Kinv = jnp.asarray(np.linalg.inv(Kt).astype(np.float32))
    for d, c, m, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(d), jnp.asarray(c), jnp.asarray(m), e2i, Ktj)
        b_fv, mi_f = fuse_frame_blocked(b_fv, *args, cfg_fv)
        b_dma, mi_d = fuse_frame_blocked(b_dma, *args, cfg_dma)
        xla = fuse_frame(xla, *args, cfg_fv)
        assert int(mi_f) == 0 and int(mi_d) == 0

    # the two Pallas paths must agree bit-for-bit with each other and
    # with the exact XLA state on the integer channels
    dense = to_dense(b_fv, cfg_fv)
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(np.asarray(getattr(b_fv, f)),
                                      np.asarray(getattr(b_dma, f)))
    np.testing.assert_array_equal(np.asarray(dense.weight),
                                  np.asarray(xla.weight))
    np.testing.assert_array_equal(np.asarray(dense.hist).astype(np.uint16),
                                  np.asarray(xla.hist))

    # host-side replica of the tier-1 dispatch test on the LAST frame:
    # a meaningful fraction of visible blocks must fit the (32, 128)
    # tight window, i.e. the fast body genuinely executed above
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import _block_origins

    d, c, m, E = frames[-1]
    e2i = jnp.asarray((E @ E0inv).astype(np.float32))
    rect_h, rect_w = cfg_fv.pallas_rect
    origins, _fm, _ff, _om = _block_origins(
        b_fv, e2i, Ktj, max(Ht, rect_h), max(Wt, rect_w), rect_h, rect_w,
        img_h=Ht, img_w=Wt, rect_mid=cfg_fv.pallas_rect_mid,
        depth=jnp.asarray(d), depth_scale=cfg_fv.depth_scale, mu=b_fv.mu)
    code1 = (np.asarray(origins) & 3) == 1  # packed: code in bits 0-1
    assert code1.sum() > 20, "fixture must have visible blocks"
    nbx, nby, nbz = b_fv.nbx, b_fv.nby, b_fv.nbz
    En = np.asarray(e2i, np.float64)
    Km = np.asarray(Kt, np.float64)
    vs = np.asarray(b_fv.vol_start, np.float64)
    vx = np.asarray(b_fv.voxel, np.float64)
    bx = np.arange(nbx)[:, None, None]
    by = np.arange(nby)[None, :, None]
    bz = np.arange(nbz)[None, None, :]
    umin = np.full((nbx, nby, nbz), np.inf)
    umax = -umin.copy()
    vmin = umin.copy()
    vmax = -umin.copy()
    for cx in (0.0, BX):
        for cy in (0.0, BY):
            for cz in (0.0, BZ):
                px = vs[0] + (bx * BX + cx) * vx[0]
                py = vs[1] + (by * BY + cy) * vx[1]
                pz = vs[2] + (bz * BZ + cz) * vx[2]
                zz = (En[2, 0] * px + En[2, 1] * py + En[2, 2] * pz
                      + En[2, 3])
                uu = (Km[0, 0] * (En[0, 0] * px + En[0, 1] * py
                                  + En[0, 2] * pz + En[0, 3])
                      + Km[0, 2] * zz) / zz
                vv = (Km[1, 1] * (En[1, 0] * px + En[1, 1] * py
                                  + En[1, 2] * pz + En[1, 3])
                      + Km[1, 2] * zz) / zz
                umin = np.minimum(umin, uu)
                umax = np.maximum(umax, uu)
                vmin = np.minimum(vmin, vv)
                vmax = np.maximum(vmax, vv)
    vmin_c = np.clip(vmin, 0, Ht - 1)
    vmax_c = np.clip(vmax, 0, Ht - 1)
    umin_c = np.clip(umin, 0, Wt - 1)
    umax_c = np.clip(umax, 0, Wt - 1)
    tier1 = ((np.floor(vmax_c) - np.floor(vmin_c / 8) * 8 < 32)
             & (np.floor(umax_c) - np.floor(umin_c / 128) * 128 < 128))
    frac = tier1.reshape(-1)[code1].mean()
    assert frac > 0.2, f"tier-1 fast path barely exercised: {frac:.2%}"


def test_rowdyn_tier_matches_default():
    """pallas_rowdyn=True (per-sublane-row dynamic 16-row windows inside
    the frame_vmem dispatch) must be bit-identical to the static-tier
    default AND to the exact XLA oracle — the tier changes which window
    bytes each gather touches, never the looked-up values. Uses the
    fine-block fixture (production-like footprints) so the rowdyn
    dispatch genuinely fires, and runs BOTH the single-frame and the
    paired kernel forms."""
    Ht, Wt = 240, 320
    Kt = make_intrinsic(260.0, 260.0, Wt / 2, Ht / 2)
    kw = dict(vol_dim=(128, 128, 64), hist_dtype=jnp.uint16,
              pallas_rect=(48, 256), pallas_rect_mid=(128, 384))
    cfg_rd = FusionConfig(pallas_rowdyn=True, **kw)
    cfg_st = FusionConfig(pallas_rowdyn=False, **kw)
    scene = default_scene()
    frames = []
    for E in identity_pose_sequence(3):
        d, c, m = render_frame(scene, E, Kt, Ht, Wt)
        frames.append((d, c, m, E))
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())

    b_rd = to_blocked(init_from_first_frame(cfg_rd, depth0, Kt, md),
                      cfg_rd)
    b_st = to_blocked(init_from_first_frame(cfg_st, depth0, Kt, md),
                      cfg_st)
    xla = init_from_first_frame(cfg_rd, depth0, Kt, md)
    E0inv = np.linalg.inv(frames[0][3])
    Ktj = jnp.asarray(Kt)
    for d, c, m, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(d), jnp.asarray(c), jnp.asarray(m), e2i, Ktj)
        b_rd, mi_r = fuse_frame_blocked(b_rd, *args, cfg_rd)
        b_st, mi_s = fuse_frame_blocked(b_st, *args, cfg_st)
        xla = fuse_frame(xla, *args, cfg_rd)
        assert int(mi_r) == 0 and int(mi_s) == 0
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(np.asarray(getattr(b_rd, f)),
                                      np.asarray(getattr(b_st, f)))
    dense = to_dense(b_rd, cfg_rd)
    np.testing.assert_array_equal(np.asarray(dense.weight),
                                  np.asarray(xla.weight))
    np.testing.assert_array_equal(np.asarray(dense.hist).astype(np.uint16),
                                  np.asarray(xla.hist))

    # paired form with rowdyn vs two sequential single-frame launches
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import (
        fuse_frames2_blocked_impl)

    d1, c1, m1, E1 = frames[1]
    d2, c2, m2, E2 = frames[2]
    e1 = jnp.asarray((E1 @ E0inv).astype(np.float32))
    e2 = jnp.asarray((E2 @ E0inv).astype(np.float32))
    b_pair, mi_p = fuse_frames2_blocked_impl(
        b_rd, jnp.asarray(d1), jnp.asarray(c1), jnp.asarray(m1), e1,
        jnp.asarray(d2), jnp.asarray(c2), jnp.asarray(m2), e2, Ktj,
        cfg_rd)
    b_seq = b_st
    for d, c, m, e in ((d1, c1, m1, e1), (d2, c2, m2, e2)):
        b_seq, _mi = fuse_frame_blocked(b_seq, jnp.asarray(d),
                                        jnp.asarray(c), jnp.asarray(m), e,
                                        Ktj, cfg_st)
    assert int(mi_p) == 0
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(np.asarray(getattr(b_pair, f)),
                                      np.asarray(getattr(b_seq, f)))


def test_defer_writeback_off_matches_on():
    """pallas_defer_writeback=False (the old inline start+wait
    write-backs) must match the deferred default bit-for-bit — the
    deferral changes DMA wait placement only."""
    cfg_i = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16,
                         pallas_rect=(128, 256),
                         pallas_defer_writeback=False)
    frames = _frames(3)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    b_on = to_blocked(init_from_first_frame(CFG, depth0, K4, md), CFG)
    b_off = to_blocked(init_from_first_frame(cfg_i, depth0, K4, md),
                       cfg_i)
    E0inv = np.linalg.inv(frames[0][3])
    for depth, img, mask, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        args = (jnp.asarray(depth), jnp.asarray(img), jnp.asarray(mask),
                e2i, jnp.asarray(K4))
        b_on, m_on = fuse_frame_blocked(b_on, *args, CFG)
        b_off, m_off = fuse_frame_blocked(b_off, *args, cfg_i)
        assert int(m_on) == 0 and int(m_off) == 0
    for f in ("weight", "hist", "colorpk", "diff"):
        np.testing.assert_array_equal(np.asarray(getattr(b_off, f)),
                                      np.asarray(getattr(b_on, f)))
