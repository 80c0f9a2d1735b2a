"""Generate the committed stress-sequence goldens (VERDICT r1 missing #2).

Fuses the hard synthetic sequence (camera orbiting AND entering the
volume, detector-style local mask ids, instance churn) through the
production pallas backend at 64^3 on CPU, then writes:

* ``tests/goldens/hard_seq.json`` — integer-exact state checksums
  (weight/hist sums, per-global-id voxel support, num_objs, the
  local->global relabel trace) + diff statistics;
* ``tests/goldens/hard_render_{instance,color}.png`` — splat renders of
  the final volume from the sensor pose.

tests/test_goldens.py regenerates and compares. Regenerate only when an
intentional semantic change shifts the numbers:

    python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


def build(write: bool = True):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from slam_maskrcnn_tpu.data.synthetic import hard_scene, hard_sequence
    from slam_maskrcnn_tpu.fusion import FusionConfig, SemanticFusion
    from slam_maskrcnn_tpu.fusion.splat import (pinhole_of_extrinsic,
                                                splat_render)
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic

    H, W = 120, 160
    K4 = make_intrinsic(130.0, 130.0, W / 2, H / 2)
    scene = hard_scene()
    frames = hard_sequence(scene, K4, H, W, n_frames=16)
    cfg = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16)
    fus = SemanticFusion(K4, cfg, backend="pallas", miss_check_every=0)

    relabel_trace = []
    for fr in frames:
        mg = fus.parse_frame(fr["depth"], fr["color"], fr["mask"],
                             fr["extrinsic"], fr["mean_depth"])
        if mg is None:
            relabel_trace.append([])
            continue
        mg = np.asarray(mg)
        m = fr["mask"]
        pairs = []
        for lid in range(1, int(m.max()) + 1):
            sel = m == lid
            gid = int(np.bincount(mg[sel]).argmax()) if sel.any() else 0
            pairs.append(gid)
        relabel_trace.append(pairs)

    st = fus.state
    hist = np.asarray(st.hist)
    per_id = hist.astype(np.int64).reshape(-1, 128)
    K = cfg.max_objects
    vpk = 128 // K
    per_bin = per_id.reshape(-1, vpk, K).sum(axis=(0, 1))
    diff = np.asarray(st.diff)
    golden = {
        "n_frames": len(frames),
        "misses": int(fus.last_misses),
        "num_objs": int(st.num_objs),
        "weight_sum": int(np.asarray(st.weight).astype(np.int64).sum()),
        "hist_sum": int(per_bin.sum()),
        "hist_per_bin": per_bin.tolist(),
        "diff_negative_voxels": int((diff < 0).sum()),
        "diff_sum_1e3": round(float(diff.astype(np.float64).sum()) * 1e-3,
                              3),
        "relabel_trace": relabel_trace,
    }

    e2i = (frames[-1]["extrinsic"]
           @ np.linalg.inv(np.asarray(frames[0]["extrinsic"],
                                      np.float64)).astype(np.float32))
    M, m4 = pinhole_of_extrinsic(jnp.asarray(e2i), jnp.asarray(K4))
    renders = {}
    for mode in ("instance", "color"):
        img = np.asarray(splat_render(st, M, m4, H, W, cfg, mode=mode))
        renders[mode] = img
    if write:
        import cv2

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(os.path.join(GOLDEN_DIR, "hard_seq.json"), "w") as f:
            json.dump(golden, f, indent=1)
        for mode, img in renders.items():
            cv2.imwrite(os.path.join(GOLDEN_DIR, f"hard_render_{mode}.png"),
                        img[:, :, ::-1])  # RGB -> BGR for imwrite
        print("goldens written to", GOLDEN_DIR)
    return golden, renders


if __name__ == "__main__":
    g, _ = build()
    print(json.dumps({k: v for k, v in g.items()
                      if k not in ("hist_per_bin", "relabel_trace")}))
