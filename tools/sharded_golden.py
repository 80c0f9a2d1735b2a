"""Production-shape sharded-fusion correctness golden (VERDICT r3 #4).

Runs the hard stress sequence (tests/test_goldens.py's trajectory class:
camera entering the volume, per-frame local ids, instance churn) through
the blocked Pallas fusion step at a production-class shape — 256x256x64
voxels = 2048 (8,8,32) blocks, production rect cascade and budgets — on
the virtual 8-device CPU mesh (shard_map, pmin/psum probe combine,
parallel/sharding.py), and asserts the FULL state (diff/colorpk/weight/
hist) and every per-frame relabeled mask are BIT-IDENTICAL to the
1-device run. Writes SHARDED_GOLDEN.json.

The CI-sized twin lives in tests/test_volume_sharding.py
(test_production_config_sharded_golden, 128x128x64); this tool is the
full-size record (~6 min cold on the 1-core box, interpret-mode Pallas).

    python tools/sharded_golden.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build(vol=(256, 256, 64), n_frames=4, write=True):
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax.numpy as jnp
    import numpy as np

    from slam_maskrcnn_tpu.data.synthetic import hard_scene, hard_sequence
    from slam_maskrcnn_tpu.fusion import FusionConfig, init_from_first_frame
    from slam_maskrcnn_tpu.fusion.pipeline import fusion_step_blocked
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic
    from slam_maskrcnn_tpu.ops.pallas.fuse_kernel import to_blocked
    from slam_maskrcnn_tpu.parallel import (make_mesh,
                                            make_sharded_fusion_step,
                                            shard_volume_state)

    n_dev = 8
    assert len(jax.devices()) >= n_dev, \
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    H, W = 120, 160
    K4 = make_intrinsic(130.0, 130.0, W / 2, H / 2)
    frames = hard_sequence(hard_scene(), K4, H, W, n_frames=n_frames)
    # production rect cascade; pass-B budget sized to the stress (the
    # camera-inside frame flags 1024 full-image blocks at 256x256x64 —
    # measured — vs the 256 default; budgets clamp to NB internally, so
    # each of the 8 shards runs at its local NB)
    cfg = FusionConfig(vol_dim=vol, hist_dtype=jnp.uint16,
                       near_block_budget=1536)
    depth0 = frames[0]["depth"]
    md = float(frames[0]["mean_depth"])
    Kj = jnp.asarray(K4)
    E0i = np.linalg.inv(frames[0]["extrinsic"]).astype(np.float32)

    def staged(fr):
        return (jnp.asarray(fr["depth"]), jnp.asarray(fr["color"]),
                jnp.asarray(fr["mask"]),
                jnp.asarray((fr["extrinsic"] @ E0i).astype(np.float32)))

    t0 = time.time()
    ref = to_blocked(init_from_first_frame(cfg, depth0, K4, md), cfg)
    ref_masks = []
    for fr in frames[1:]:
        d, c, m, e2i = staged(fr)
        ref, mg, miss = fusion_step_blocked(ref, d, c, m, e2i, Kj, cfg)
        assert int(miss) == 0
        ref_masks.append(np.asarray(mg))
    t_ref = time.time() - t0

    mesh = make_mesh(n_dev)
    step = make_sharded_fusion_step(cfg, mesh,
                                    max_blocks=ref.diff.shape[0])
    t0 = time.time()
    st = shard_volume_state(
        to_blocked(init_from_first_frame(cfg, depth0, K4, md), cfg), mesh)
    assert len(set(st.diff.devices())) == n_dev
    eq_masks = []
    for i, fr in enumerate(frames[1:]):
        d, c, m, e2i = staged(fr)
        st, mg, miss = step(st, d, c, m, e2i, Kj)
        assert int(miss) == 0
        eq_masks.append(bool(np.array_equal(np.asarray(mg), ref_masks[i])))
    t_sh = time.time() - t0

    eq = {f: bool(np.array_equal(np.asarray(getattr(st, f)),
                                 np.asarray(getattr(ref, f))))
          for f in ("diff", "colorpk", "weight", "hist")}

    # sharded RENDER vs the 1-device splat render (VERDICT r4 #8: the
    # viewer read across shards — viewer.cu:137-179 reads the whole
    # volume per displayed frame). Tie-break differences (two shards'
    # surfaces at the same pixel) are the only allowed mismatch class.
    from slam_maskrcnn_tpu.fusion.splat import splat_render_orbit
    from slam_maskrcnn_tpu.parallel import make_sharded_render

    render_cmp = {}
    for mode in ("instance", "color"):
        rfn = make_sharded_render(cfg, mesh,
                                  max_blocks=ref.diff.shape[0], mode=mode)
        img_sh = np.asarray(rfn(st, 0.05, md, Kj, H, W))
        img_1d = np.asarray(splat_render_orbit(ref, 0.05, md, Kj, H, W,
                                               cfg, mode=mode))
        mism = float((img_sh != img_1d).any(axis=-1).mean())
        render_cmp[mode] = {
            "mismatch_pixel_fraction": round(mism, 6),
            "covered_fraction": round(
                float((img_sh.sum(-1) > 0).mean()), 4)}
    out = {
        "vol_dim": list(vol), "n_blocks": int(ref.diff.shape[0]),
        "n_devices": n_dev, "frames": n_frames - 1,
        "sequence": "hard_sequence (camera enters volume, instance churn)",
        "config": "production defaults (rect cascade, budgets clamp to NB)",
        "state_bit_equal": eq,
        "masks_bit_equal": eq_masks,
        "num_objs_equal": int(st.num_objs) == int(ref.num_objs),
        "num_objs": int(ref.num_objs),
        "render_vs_1dev": render_cmp,
        "weight_sum": int(np.asarray(ref.weight, np.int64).sum()),
        "hist_sum": int(np.asarray(ref.hist, np.int64).sum()),
        "t_single_s": round(t_ref, 1), "t_sharded_s": round(t_sh, 1),
    }
    ok = (all(eq.values()) and all(eq_masks) and out["num_objs_equal"]
          and all(v["mismatch_pixel_fraction"] <= 0.01
                  for v in render_cmp.values()))
    out["ok"] = ok
    if write:
        with open(os.path.join(REPO, "SHARDED_GOLDEN.json"), "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    out = build()
    print(json.dumps({k: out[k] for k in
                      ("ok", "vol_dim", "n_blocks", "state_bit_equal",
                       "num_objs")}))
    sys.exit(0 if out["ok"] else 1)
