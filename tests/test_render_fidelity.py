"""Bound the splat-vs-march render fidelity (VERDICT r2 next #6).

The production renderer (fusion/splat.py) shades the NEAREST surface
voxel; the oracle (fusion/raycast.py) marches to the trilinear zero
crossing like the reference (``viewer.cu:124-132``, ``utils.cu:99-170``).
tools/render_fidelity.py measures the full-golden numbers into
RENDER_FIDELITY.json; this test recomputes a reduced view so a regression
in either path fails CI. Mismatches concentrate at instance/silhouette
boundaries (the two paths disagree by at most one voxel on where a
surface sample lands); interiors agree — see the interior-mismatch
assertion, which is the tight one.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from slam_maskrcnn_tpu.data.synthetic import hard_scene, hard_sequence
from slam_maskrcnn_tpu.fusion import FusionConfig, SemanticFusion
from slam_maskrcnn_tpu.fusion.raycast import render_orbit
from slam_maskrcnn_tpu.fusion.splat import splat_render_orbit
from slam_maskrcnn_tpu.fusion.state import make_intrinsic

H, W = 120, 160


@pytest.fixture(scope="module")
def fused():
    K4 = make_intrinsic(130.0, 130.0, W / 2, H / 2)
    frames = hard_sequence(hard_scene(), K4, H, W, n_frames=8)
    cfg = FusionConfig(vol_dim=(64,) * 3, hist_dtype=jnp.uint16)
    fus = SemanticFusion(K4, cfg, backend="pallas", miss_check_every=0)
    for fr in frames:
        fus.parse_frame(fr["depth"], fr["color"], fr["mask"],
                        fr["extrinsic"], fr["mean_depth"])
    Ki = np.linalg.inv(K4).astype(np.float32)
    return fus, cfg, jnp.asarray(K4), jnp.asarray(Ki)


def _renders(fused, mode, angle=0.35):
    fus, cfg, Kj, Ki = fused
    sp = np.asarray(splat_render_orbit(fus.state, angle, fus.mean_depth,
                                       Kj, H, W, cfg, mode=mode))
    ma = np.asarray(render_orbit(fus.dense_state(), jnp.float32(angle),
                                 jnp.float32(fus.mean_depth), Ki, H, W,
                                 cfg, mode=mode))
    return sp, ma


def test_instance_fidelity(fused):
    sp, ma = _renders(fused, "instance")
    ha, hb = sp.sum(-1) > 0, ma.sum(-1) > 0
    both = ha & hb
    assert both.sum() > 500, "scene not visible"
    # coverage: the two paths agree on surface-vs-empty almost everywhere
    assert float((ha == hb).mean()) > 0.85
    exact = (sp[both] == ma[both]).all(-1)
    assert float(exact.mean()) > 0.70
    # the tight bound: mismatches are a boundary phenomenon — nearest-voxel
    # vs trilinear shading can only disagree where a label/silhouette edge
    # passes within one sample. Off the UNION of both images' 1-px label
    # edges, the two shadings agree (measured 0.00% interior mismatch).
    edge = np.zeros_like(both)
    for img in (sp, ma):
        lab = img.astype(np.int64)
        key = lab[..., 0] * 65536 + lab[..., 1] * 256 + lab[..., 2]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                edge |= np.roll(key, (dy, dx), (0, 1)) != key
    mism = both & ~(sp == ma).all(-1)
    interior_mism = float((mism & ~edge).sum()) / max(int(both.sum()), 1)
    assert interior_mism < 0.01, f"interior mismatch {interior_mism:.4f}"


def test_fat_fixture_interior_evidence():
    """VERDICT r4 #9: the 64^3 thin-object fixture left n=17 interior
    pixels at angle 0.05 — too little evidence for the 'interior exact'
    claim. The fat fixture (128x128x64 volume, 240x320 image, 4 fat
    spheres) must yield >= 1000 instance-interior pixels per view with
    EXACT palette agreement, and every mismatching pixel must sit within
    a bounded chebyshev distance of a label edge (the boundary-band-width
    metric; tools/render_fidelity.py records the full sweep)."""
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from render_fidelity import fat_scene, fidelity, mismatch_band_width

    from slam_maskrcnn_tpu.data.synthetic import hard_sequence
    from slam_maskrcnn_tpu.fusion.raycast import render_orbit
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic

    Hf, Wf = 240, 320
    K4 = make_intrinsic(310.0, 310.0, Wf / 2, Hf / 2)
    frames = hard_sequence(fat_scene(), K4, Hf, Wf, n_frames=6)
    cfg = FusionConfig(vol_dim=(128, 128, 64), hist_dtype=jnp.uint16)
    fus = SemanticFusion(K4, cfg, backend="pallas", miss_check_every=0)
    for fr in frames:
        fus.parse_frame(fr["depth"], fr["color"], fr["mask"],
                        fr["extrinsic"], fr["mean_depth"])
    Ki = np.linalg.inv(K4).astype(np.float32)
    for angle in (0.05, 0.35):
        sp = np.asarray(splat_render_orbit(fus.state, angle,
                                           fus.mean_depth, jnp.asarray(K4),
                                           Hf, Wf, cfg, mode="instance"))
        ma = np.asarray(render_orbit(fus.dense_state(), jnp.float32(angle),
                                     jnp.float32(fus.mean_depth),
                                     jnp.asarray(Ki), Hf, Wf, cfg,
                                     mode="instance"))
        _agree, _exact, _psnr, interior = fidelity(sp, ma)
        assert interior["n"] >= 1000, (angle, interior)
        assert interior["exact"] == 1.0, (angle, interior)
        assert mismatch_band_width(sp, ma) <= 6, angle


def test_color_fidelity(fused):
    sp, ma = _renders(fused, "color")
    ha, hb = sp.sum(-1) > 0, ma.sum(-1) > 0
    both = ha & hb
    assert both.sum() > 500
    assert float((ha == hb).mean()) > 0.90
    d = sp[both].astype(np.float64) - ma[both].astype(np.float64)
    mse = float((d ** 2).mean())
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 12.0, f"psnr {psnr:.2f} dB"
    # interior decomposition (VERDICT r3 #3): off the union of both
    # images' 1-px color-edge bands, the splat's winner-voxel color and
    # the oracle's trilinear blend differ only by the interpolation
    # residual — interior PSNR must sit well above the global figure
    # (boundary pixels dominate the global MSE)
    edge = np.zeros_like(both)
    for img in (sp, ma):
        lab = img.astype(np.int64)
        key = lab[..., 0] * 65536 + lab[..., 1] * 256 + lab[..., 2]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                edge |= np.roll(key, (dy, dx), (0, 1)) != key
    interior = both & ~edge
    if int(interior.sum()) > 100:
        di = sp[interior].astype(np.float64) - ma[interior].astype(
            np.float64)
        imse = float((di ** 2).mean())
        ipsnr = 10.0 * np.log10(255.0 ** 2 / max(imse, 1e-9))
        assert ipsnr > psnr + 5.0, \
            f"interior psnr {ipsnr:.2f} vs global {psnr:.2f} dB"
