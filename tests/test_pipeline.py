"""End-to-end fusion pipeline on a synthetic RGB-D sequence (the minimum
end-to-end slice of SURVEY §7 step 4): init -> fuse -> associate across
frames -> render, with no neural network and no dataset files."""

import numpy as np
import jax.numpy as jnp

from slam_maskrcnn_tpu.fusion import FusionConfig, SemanticFusion, render_orbit
from slam_maskrcnn_tpu.fusion.pipeline import fuse_sequence
from slam_maskrcnn_tpu.fusion.state import make_intrinsic, init_from_first_frame
from slam_maskrcnn_tpu.data.synthetic import (default_scene, make_sequence)

H, W = 60, 80
K4 = make_intrinsic(70.0, 70.0, W / 2, H / 2)
CFG = FusionConfig(vol_dim=(48, 48, 48))


def _shuffled_mask(mask, perm):
    """Relabel instance ids to simulate per-frame Mask R-CNN id instability."""
    out = np.zeros_like(mask)
    for old, new in perm.items():
        out[mask == old] = new
    return out


def test_pipeline_end_to_end_stable_ids():
    frames = make_sequence(default_scene(), K4, H, W, n_frames=6)
    fusion = SemanticFusion(K4, CFG)
    # swap ids in later frames: {1<->2} — association must undo it
    perms = [{1: 1, 2: 2}, {1: 1, 2: 2}, {1: 2, 2: 1},
             {1: 2, 2: 1}, {1: 1, 2: 2}, {1: 2, 2: 1}]
    relabeled = []
    for fr, perm in zip(frames, perms):
        mask_in = _shuffled_mask(fr["mask"], perm)
        out = fusion.parse_frame(fr["depth"], fr["color"], mask_in,
                                 fr["extrinsic"], fr["mean_depth"])
        if out is not None:
            relabeled.append(np.asarray(out))
    assert len(relabeled) == 5  # frame 0 only initializes (parity)
    # after association, relabeled masks must agree with the *original*
    # (stable) ids up to a fixed global renaming: pixels of true sphere 1
    # must carry one consistent global id across all fused frames.
    for s_true in (1, 2):
        ids = []
        for out, fr in zip(relabeled, frames[1:]):
            m = fr["mask"] == s_true
            if m.sum() == 0:
                continue
            vals, counts = np.unique(out[m], return_counts=True)
            ids.append(int(vals[np.argmax(counts)]))
        assert len(set(ids)) == 1, f"sphere {s_true} got ids {ids}"
    assert int(fusion.state.num_objs) <= 6  # no id explosion

    # the fused volume renders the spheres with stable palette colors
    img = np.asarray(render_orbit(fusion.state, 0.3, fusion.mean_depth,
                                  jnp.asarray(fusion.intrinsic_inv), H, W, CFG))
    assert img.shape == (H, W, 3)
    assert (img.reshape(-1, 3).max(0) > 0).any()  # something rendered


def test_fuse_sequence_scan_matches_stepwise():
    frames = make_sequence(default_scene(), K4, H, W, n_frames=4)
    cfg = FusionConfig(vol_dim=(32, 32, 32))

    fusion = SemanticFusion(K4, cfg)
    for fr in frames:
        fusion.parse_frame(fr["depth"], fr["color"], fr["mask"],
                           fr["extrinsic"], fr["mean_depth"])

    # scan path: same init, frames 1.. as stacked arrays
    state = init_from_first_frame(cfg, frames[0]["depth"], K4,
                                  frames[0]["mean_depth"])
    E0_inv = np.linalg.inv(frames[0]["extrinsic"]).astype(np.float32)
    e2is = np.stack([fr["extrinsic"] @ E0_inv for fr in frames[1:]])
    depths = np.stack([fr["depth"] for fr in frames[1:]])
    colors = np.stack([fr["color"] for fr in frames[1:]])
    masks = np.stack([fr["mask"] for fr in frames[1:]])
    K_inv = np.linalg.inv(K4).astype(np.float32)
    final, masks_g = fuse_sequence(state, jnp.asarray(depths),
                                   jnp.asarray(colors), jnp.asarray(masks),
                                   jnp.asarray(e2is), jnp.asarray(K4),
                                   jnp.asarray(K_inv), cfg)
    np.testing.assert_allclose(np.asarray(final.diff),
                               np.asarray(fusion.state.diff), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(final.weight),
                                  np.asarray(fusion.state.weight))
    np.testing.assert_array_equal(np.asarray(final.hist),
                                  np.asarray(fusion.state.hist))
    assert masks_g.shape == (3, H, W)
