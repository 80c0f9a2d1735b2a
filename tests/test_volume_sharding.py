"""Volume sharding on the virtual 8-device CPU mesh (SURVEY §5.7/§2.5).

The one scale axis of this workload: the TSDF grid sharded across devices.
* dense path: state sharded on volume-x via NamedSharding, the SAME jitted
  fusion_step — GSPMD partitions it (gathers across shards in the probe).
* blocked/Pallas path: shard_map over the block axis with an explicit
  pmin/psum probe combine (parallel/sharding.make_sharded_fusion_step).

Both are asserted against the single-device result, which is itself
oracle-tested against the literal NumPy transcription of the reference
CUDA (tests/test_fusion.py).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from slam_maskrcnn_tpu.data.synthetic import (default_scene,
                                              identity_pose_sequence,
                                              render_frame)
from slam_maskrcnn_tpu.fusion import (FusionConfig, fusion_step,
                                      init_from_first_frame)
from slam_maskrcnn_tpu.fusion.pipeline import fusion_step_blocked
from slam_maskrcnn_tpu.fusion.state import make_intrinsic
from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import to_blocked
from slam_maskrcnn_tpu.parallel import (make_mesh, make_sharded_fusion_step,
                                        make_sharded_render,
                                        shard_volume_state)

H, W = 48, 64
K4 = make_intrinsic(52.0, 52.0, W / 2, H / 2)


def _frames(n):
    scene = default_scene()
    out = []
    for E in identity_pose_sequence(n):
        d, c, m = render_frame(scene, E, K4, H, W)
        out.append((d, c, m, E))
    return out


def _staged(frames):
    E0inv = np.linalg.inv(frames[0][3])
    staged = []
    for d, c, m, E in frames:
        e2i = jnp.asarray((E @ E0inv).astype(np.float32))
        staged.append((jnp.asarray(d), jnp.asarray(c), jnp.asarray(m), e2i))
    return staged


def test_dense_fusion_step_sharded_matches_single():
    """shard_volume_state + the SAME jitted fusion_step on an 8-device mesh
    must reproduce the single-device result (probe gathers cross shards;
    XLA inserts the collectives)."""
    cfg = FusionConfig(vol_dim=(32, 32, 32), hist_dtype=jnp.uint16)
    frames = _frames(4)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    staged = _staged(frames)
    Kj = jnp.asarray(K4)
    Kinv = jnp.asarray(np.linalg.inv(K4).astype(np.float32))

    ref = init_from_first_frame(cfg, depth0, K4, md)
    for d, c, m, e2i in staged[1:]:
        ref, ref_mask = fusion_step(ref, d, c, m, e2i, Kj, Kinv, cfg)

    mesh = make_mesh(8)
    st = shard_volume_state(init_from_first_frame(cfg, depth0, K4, md), mesh)
    assert len(set(st.diff.devices())) == 8, "state must actually shard"
    for d, c, m, e2i in staged[1:]:
        st, st_mask = fusion_step(st, d, c, m, e2i, Kj, Kinv, cfg)

    np.testing.assert_array_equal(np.asarray(st.weight),
                                  np.asarray(ref.weight))
    np.testing.assert_array_equal(np.asarray(st.hist), np.asarray(ref.hist))
    np.testing.assert_allclose(np.asarray(st.diff), np.asarray(ref.diff),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_mask), np.asarray(ref_mask))
    assert int(st.num_objs) == int(ref.num_objs)


def test_production_config_sharded_golden():
    """Production-config sharded golden (VERDICT r3 #4), CI-sized: the
    hard stress sequence (camera enters the volume, per-frame local ids,
    instance churn) through the blocked Pallas step at 128x128x64 (512
    production-shape blocks, default production rect cascade/budgets) on
    the full 8-device mesh — full state AND per-frame masks bit-identical
    to the 1-device run. The full-size (256x256x64) record lives in
    SHARDED_GOLDEN.json (tools/sharded_golden.py)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from sharded_golden import build

    out = build(vol=(128, 128, 64), n_frames=4, write=False)
    assert out["ok"], out
    assert out["n_blocks"] == 512
    assert out["num_objs"] >= 2, "stress fixture must churn instances"


def test_sharded_render_matches_1dev():
    """The viewer read across shards (VERDICT r4 missing #2): the
    volume-sharded splat render (shard-local splat -> pmin z-combine ->
    owner psum of shade inputs -> replicated fill+decode) against the
    1-device splat_render_orbit on the same fused state. Exact except
    where two shards' surfaces tie at a pixel (the 1-device sort breaks
    ties by packed key) — bounded at <= 1% of pixels, and checked in
    BOTH render modes."""
    from slam_maskrcnn_tpu.fusion.splat import splat_render_orbit

    cfg = FusionConfig(vol_dim=(32, 32, 128), hist_dtype=jnp.uint16,
                       pallas_rect=(128, 256))
    n_dev = 4
    frames = _frames(4)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    staged = _staged(frames)
    Kj = jnp.asarray(K4)

    ref = to_blocked(init_from_first_frame(cfg, depth0, K4, md), cfg)
    for d, c, m, e2i in staged[1:]:
        ref, _mask, miss = fusion_step_blocked(ref, d, c, m, e2i, Kj, cfg)
        assert int(miss) == 0

    mesh = make_mesh(n_dev)
    st = shard_volume_state(ref, mesh)
    assert len(set(st.diff.devices())) == n_dev
    for mode in ("instance", "color"):
        render = make_sharded_render(cfg, mesh, max_blocks=1024, mode=mode)
        img_sh = np.asarray(render(st, 0.05, md, Kj, H, W))
        img_1d = np.asarray(splat_render_orbit(ref, 0.05, md, Kj, H, W,
                                               cfg, mode=mode))
        assert img_sh.shape == img_1d.shape == (H, W, 3)
        mismatch = (img_sh != img_1d).any(axis=-1).mean()
        assert mismatch <= 0.01, (mode, float(mismatch))
        # the sharded image must actually contain content
        assert (img_sh.sum(axis=-1) > 0).mean() > 0.05, mode


def test_blocked_fusion_step_sharded_matches_single():
    """shard_map blocked fusion (block axis sharded, frame replicated,
    pmin/psum probe combine) vs the single-device blocked step."""
    cfg = FusionConfig(vol_dim=(32, 32, 128), hist_dtype=jnp.uint16,
                       pallas_rect=(128, 256))
    n_dev = 4
    frames = _frames(4)
    depth0 = frames[0][0]
    md = float((depth0[depth0 > 0] / 5000.0).mean())
    staged = _staged(frames)
    Kj = jnp.asarray(K4)

    ref = to_blocked(init_from_first_frame(cfg, depth0, K4, md), cfg)
    for d, c, m, e2i in staged[1:]:
        ref, ref_mask, miss = fusion_step_blocked(ref, d, c, m, e2i, Kj, cfg)
        assert int(miss) == 0

    mesh = make_mesh(n_dev)
    step = make_sharded_fusion_step(cfg, mesh, max_blocks=1024)
    st = shard_volume_state(
        to_blocked(init_from_first_frame(cfg, depth0, K4, md), cfg), mesh)
    assert len(set(st.diff.devices())) == n_dev
    for d, c, m, e2i in staged[1:]:
        st, st_mask, miss = step(st, d, c, m, e2i, Kj)
        assert int(miss) == 0

    np.testing.assert_array_equal(np.asarray(st.weight),
                                  np.asarray(ref.weight))
    np.testing.assert_array_equal(np.asarray(st.hist), np.asarray(ref.hist))
    np.testing.assert_allclose(np.asarray(st.diff), np.asarray(ref.diff),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_mask),
                                  np.asarray(ref_mask))
    assert int(st.num_objs) == int(ref.num_objs)
