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


def _boundary_band(img: "np.ndarray"):
    """1-px-dilated union of coverage and label/color edges of one image:
    a pixel is in the band if any 8-neighbor (or itself) differs from it
    in coverage or RGB value."""
    import numpy as np

    lab = img.astype(np.int32)
    lab = (lab[..., 0] * 65536 + lab[..., 1] * 256 + lab[..., 2])
    edge = np.zeros(lab.shape, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            sh = np.roll(lab, (dy, dx), axis=(0, 1))
            edge |= sh != lab
    band = edge.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            band |= np.roll(edge, (dy, dx), axis=(0, 1))
    return band


def fidelity(a: "np.ndarray", b: "np.ndarray"):
    """(coverage agreement, exact-match fraction, psnr, interior stats)
    for uint8 RGB images a (splat) vs b (march). Interior = jointly
    covered pixels outside BOTH images' 1-px boundary bands (silhouette
    or instance-edge neighborhoods); the production splat picks the
    nearest surface VOXEL while the oracle interpolates the zero
    crossing, so disagreement should be confined to those bands."""
    import numpy as np

    ha = a.sum(-1) > 0
    hb = b.sum(-1) > 0
    agree = float((ha == hb).mean())
    both = ha & hb
    n_both = int(both.sum())
    if n_both == 0:
        return agree, 1.0, float("inf"), dict(n=0, exact=1.0)
    eq = (a == b).all(-1)
    exact = float(eq[both].mean())
    mse = float(((a[both].astype(np.float64)
                  - b[both].astype(np.float64)) ** 2).mean())
    psnr = float("inf") if mse == 0 else 10.0 * np.log10(255.0 ** 2 / mse)
    interior = both & ~_boundary_band(a) & ~_boundary_band(b)
    n_int = int(interior.sum())
    if n_int == 0:
        interior_stats = dict(n=0, fraction_of_covered=0.0, exact=1.0,
                              psnr_db=None)
    else:
        imse = float(((a[interior].astype(np.float64)
                       - b[interior].astype(np.float64)) ** 2).mean())
        interior_stats = dict(
            n=n_int,
            fraction_of_covered=round(n_int / n_both, 4),
            exact=round(float(eq[interior].mean()), 6),
            psnr_db=(None if imse == 0
                     else round(10.0 * np.log10(255.0 ** 2 / imse), 2)))
    return agree, exact, psnr, interior_stats


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
            agree, exact, psnr, interior = fidelity(sp, ma)
            row[mode] = {"coverage_agreement": round(agree, 4),
                         "exact_pixel_fraction": round(exact, 4),
                         "psnr_db": (None if psnr == float("inf")
                                     else round(psnr, 2)),
                         "interior": interior}
        out["views"].append(row)

    keys = ("coverage_agreement", "exact_pixel_fraction")
    out["min_instance"] = {k: min(v["instance"][k] for v in out["views"])
                           for k in keys}
    out["min_color_coverage"] = min(v["color"]["coverage_agreement"]
                                    for v in out["views"])
    out["min_color_psnr_db"] = min(
        (v["color"]["psnr_db"] or 1e9) for v in out["views"])
    # the verdict-r3 decomposition: disagreement is confined to the 1-px
    # silhouette/instance-edge bands. Instance mode (discrete palette):
    # interior pixels must match exactly. Color mode: the oracle
    # trilinearly BLENDS voxel colors (utils.cu:99-170) while the splat
    # shades the winner voxel's stored color, so interiors differ by the
    # interpolation residual — quantified as interior PSNR (>> the global
    # figure, which is dominated by boundary pixels).
    out["min_interior_exact_instance"] = min(
        v["instance"]["interior"]["exact"] for v in out["views"])
    out["min_interior_color_psnr_db"] = min(
        (v["color"]["interior"]["psnr_db"] or 1e9) for v in out["views"])
    return out


def main():
    out = build()
    path = os.path.join(REPO, "RENDER_FIDELITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["min_instance"]), out["min_color_psnr_db"])


if __name__ == "__main__":
    main()
