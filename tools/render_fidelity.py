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


def mismatch_band_width(a: "np.ndarray", b: "np.ndarray",
                        max_r: int = 6):
    """Smallest dilation radius r (chebyshev) of the union label-edge set
    that contains EVERY mismatching jointly-covered pixel — the measured
    WIDTH of the disagreement band (VERDICT r4 #9). max_r+1 means some
    mismatch sits farther than max_r from any edge (a non-boundary
    disagreement)."""
    import numpy as np

    ha, hb = a.sum(-1) > 0, b.sum(-1) > 0
    both = ha & hb
    mism = both & ~(a == b).all(-1)
    if not mism.any():
        return 0
    edge = np.zeros(both.shape, bool)
    for img in (a, b):
        lab = img.astype(np.int64)
        key = lab[..., 0] * 65536 + lab[..., 1] * 256 + lab[..., 2]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                edge |= np.roll(key, (dy, dx), (0, 1)) != key
    band = edge.copy()
    for r in range(max_r + 1):
        if not (mism & ~band).any():
            return r
        grown = band.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                grown |= np.roll(band, (dy, dx), (0, 1))
        band = grown
    return max_r + 1


def fat_scene():
    """The interior-evidence fixture (VERDICT r4 #9): FEW, FAT spheres so
    the instance channel has >= 10^3 interior pixels per view (the 64^3
    hard-scene fixture's thin objects left n=17 at angle 0.05)."""
    import numpy as np

    from slam_maskrcnn_tpu.data.synthetic import SphereScene

    centers = np.array([[-0.28, 0.05, 1.25],
                        [0.3, -0.1, 1.45],
                        [0.02, 0.22, 1.1],
                        [-0.05, -0.3, 1.6]], np.float32)
    return SphereScene(
        centers=centers,
        radii=np.array([0.26, 0.3, 0.2, 0.24], np.float32),
        colors=np.array([[200, 60, 60], [60, 200, 60],
                         [60, 60, 200], [200, 200, 60]], np.uint8),
        plane_z=2.2,
    )


def _measure(scene, vol_dim, H, W, focal, n_frames, angles):
    import jax.numpy as jnp
    import numpy as np

    from slam_maskrcnn_tpu.data.synthetic import hard_sequence
    from slam_maskrcnn_tpu.fusion import FusionConfig, SemanticFusion
    from slam_maskrcnn_tpu.fusion.raycast import render_orbit
    from slam_maskrcnn_tpu.fusion.splat import splat_render_orbit
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic

    K4 = make_intrinsic(focal, focal, W / 2, H / 2)
    frames = hard_sequence(scene, K4, H, W, n_frames=n_frames)
    cfg = FusionConfig(vol_dim=vol_dim, hist_dtype=jnp.uint16)
    fus = SemanticFusion(K4, cfg, backend="pallas", miss_check_every=0)
    for fr in frames:
        fus.parse_frame(fr["depth"], fr["color"], fr["mask"],
                        fr["extrinsic"], fr["mean_depth"])
    blocked = fus.state
    dense = fus.dense_state()
    Kj = jnp.asarray(K4)
    Ki = jnp.asarray(np.linalg.inv(K4).astype(np.float32))

    views = []
    for angle in angles:
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
                         "interior": interior,
                         "mismatch_band_width": mismatch_band_width(sp,
                                                                    ma)}
        views.append(row)
    return views


def build():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from slam_maskrcnn_tpu.data.synthetic import hard_scene

    out = {"volume": 64, "frames": 16, "views": _measure(
        hard_scene(), (64,) * 3, 120, 160, 130.0, 16, (0.05, 0.35, 0.75))}
    # the interior-evidence fixture (VERDICT r4 #9): 128^3 volume +
    # 240x320 image + fat instances -> >= 10^3 instance-interior pixels
    # per view with exact = 1.0 (asserted in tests/test_render_fidelity)
    out["fat"] = {"volume": 128, "H": 240, "W": 320, "frames": 8,
                  "views": _measure(fat_scene(), (128, 128, 64), 240, 320,
                                    310.0, 8, (0.05, 0.35, 0.75))}
    out["fat"]["min_interior_n_instance"] = min(
        v["instance"]["interior"]["n"] for v in out["fat"]["views"])
    out["fat"]["min_interior_exact_instance"] = min(
        v["instance"]["interior"]["exact"] for v in out["fat"]["views"])
    out["fat"]["max_mismatch_band_width"] = max(
        v[m]["mismatch_band_width"] for v in out["fat"]["views"]
        for m in ("instance", "color"))

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
