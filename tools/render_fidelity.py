"""Splat-vs-march render fidelity (VERDICT r2 "next" #6).

The production renderer (fusion/splat.py) shades the NEAREST surface
voxel; the exact oracle (fusion/raycast.py) interpolates the trilinear
zero crossing like the reference (``viewer.cu:124-132``,
``utils.cu:99-170``). This quantifies the image delta between the two on
the committed hard-scene goldens:

* coverage agreement (both paths agree a pixel is surface/empty),
* instance mode: % of jointly-covered pixels with the SAME palette color,
* color mode: PSNR over jointly-covered pixels.

Writes RENDER_FIDELITY.json at the repo root; tests/test_render_fidelity.py
bounds the numbers so a regression in either path fails CI.

    python tools/render_fidelity.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fidelity(a: "np.ndarray", b: "np.ndarray"):
    """(coverage agreement, exact-match fraction, psnr) for uint8 RGB
    images a (splat) vs b (march)."""
    import numpy as np

    ha = a.sum(-1) > 0
    hb = b.sum(-1) > 0
    agree = float((ha == hb).mean())
    both = ha & hb
    n_both = int(both.sum())
    if n_both == 0:
        return agree, 1.0, float("inf")
    exact = float((a[both] == b[both]).all(-1).mean())
    mse = float(((a[both].astype(np.float64)
                  - b[both].astype(np.float64)) ** 2).mean())
    psnr = float("inf") if mse == 0 else 10.0 * np.log10(255.0 ** 2 / mse)
    return agree, exact, psnr


def build():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from slam_maskrcnn_tpu.data.synthetic import hard_scene, hard_sequence
    from slam_maskrcnn_tpu.fusion import FusionConfig, SemanticFusion
    from slam_maskrcnn_tpu.fusion.raycast import render_orbit
    from slam_maskrcnn_tpu.fusion.splat import splat_render_orbit
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic

    H, W = 120, 160
    K4 = make_intrinsic(130.0, 130.0, W / 2, H / 2)
    frames = hard_sequence(hard_scene(), K4, H, W, n_frames=16)
    cfg = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16)
    fus = SemanticFusion(K4, cfg, backend="pallas", miss_check_every=0)
    for fr in frames:
        fus.parse_frame(fr["depth"], fr["color"], fr["mask"],
                        fr["extrinsic"], fr["mean_depth"])
    blocked = fus.state
    dense = fus.dense_state()
    Kj = jnp.asarray(K4)
    Ki = jnp.asarray(np.linalg.inv(K4).astype(np.float32))

    out = {"volume": 64, "frames": len(frames), "views": []}
    for angle in (0.05, 0.35, 0.75):
        row = {"angle": angle}
        for mode in ("instance", "color"):
            sp = np.asarray(splat_render_orbit(
                blocked, angle, fus.mean_depth, Kj, H, W, cfg, mode=mode))
            ma = np.asarray(render_orbit(
                dense, jnp.float32(angle), jnp.float32(fus.mean_depth),
                Ki, H, W, cfg, mode=mode))
            agree, exact, psnr = fidelity(sp, ma)
            row[mode] = {"coverage_agreement": round(agree, 4),
                         "exact_pixel_fraction": round(exact, 4),
                         "psnr_db": (None if psnr == float("inf")
                                     else round(psnr, 2))}
        out["views"].append(row)

    keys = ("coverage_agreement", "exact_pixel_fraction")
    out["min_instance"] = {k: min(v["instance"][k] for v in out["views"])
                           for k in keys}
    out["min_color_coverage"] = min(v["color"]["coverage_agreement"]
                                    for v in out["views"])
    out["min_color_psnr_db"] = min(
        (v["color"]["psnr_db"] or 1e9) for v in out["views"])
    return out


def main():
    out = build()
    path = os.path.join(REPO, "RENDER_FIDELITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["min_instance"]), out["min_color_psnr_db"])


if __name__ == "__main__":
    main()
