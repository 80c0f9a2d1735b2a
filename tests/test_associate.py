"""Instance-association tests vs a literal Python transcription of
TSDF::filter_overlaps (reference src/SfM_CUDA/tsdf.cu:304-416)."""

import numpy as np
import jax.numpy as jnp

from slam_maskrcnn_tpu.fusion import FusionConfig
from slam_maskrcnn_tpu.fusion.associate import apply_relabel, associate_instances

CFG = FusionConfig(vol_dim=(8, 8, 8), max_objects=32)


def filter_overlaps_ref(probs, box_mask, mask, n_obs, num_objs,
                        prior=0.05):
    """Literal loop transcription of the reference association (oracle)."""
    H, W, K = probs.shape
    mask = mask.copy().astype(np.int64)
    max_obj_now = int(mask.max()) + 1
    assignments = np.zeros((K, K))
    cnts = np.zeros((K, K), np.int64)
    mflat = mask.reshape(-1)
    pflat = probs.reshape(-1, K)
    bflat = box_mask.reshape(-1, K)
    for i in range(H * W):
        if mflat[i] > 0:
            for j in range(1, K):
                assignments[mflat[i]][j] += np.log(max(pflat[i, j] / n_obs, prior))
                cnts[mflat[i]][j] += 1
        for n in range(1, K):
            if bflat[i, n]:
                for m in range(1, max_obj_now):
                    if mflat[i] == m:
                        continue
                    assignments[m][n] += np.log(max(1.0 - pflat[i, n] / n_obs, prior))
                    cnts[m][n] += 1
    assign_map, assign_map_prob = {}, {}
    for i in range(1, max_obj_now):
        max_j, max_prob = -1, 0.0
        for j in range(1, K):
            prob = 0.0 if cnts[i][j] == 0 else np.exp(assignments[i][j] / cnts[i][j])
            if prob > max_prob:
                max_j, max_prob = j, prob
        if max_prob > 3 * prior:
            if max_j not in assign_map or assign_map_prob[max_j] < max_prob:
                assign_map[max_j] = i
                assign_map_prob[max_j] = max_prob
    rev = {v: k for k, v in assign_map.items()}
    extra = {}
    out = mflat.copy()
    for i in range(H * W):
        v = mflat[i]
        if v in rev:
            out[i] = rev[v]
        elif v > 0:
            if v not in extra:
                extra[v] = num_objs
                num_objs += 1
            out[i] = extra[v]
    return out.reshape(H, W), num_objs


def _random_case(seed, H=16, W=20, n_cur=3, n_glob=4, n_obs=6, num_objs=5):
    rng = np.random.default_rng(seed)
    K = CFG.max_objects
    mask = rng.integers(0, n_cur + 1, size=(H, W)).astype(np.uint8)
    probs = np.zeros((H, W, K), np.float32)
    # plant correlation: current id 1 overlaps global id 2 strongly
    probs[..., 2] = np.where(mask == 1, n_obs * 0.9, 0.0)
    # noise on other bins
    probs[..., 3] = rng.uniform(0, n_obs * 0.2, (H, W))
    box_mask = probs > 0.3
    return probs, box_mask, mask, n_obs, num_objs


def test_associate_matches_reference_loop():
    for seed in range(4):
        probs, box_mask, mask, n_obs, num_objs = _random_case(seed)
        relabel, new_num = associate_instances(
            jnp.asarray(probs), jnp.asarray(box_mask), jnp.asarray(mask),
            jnp.asarray(n_obs, jnp.int32), jnp.asarray(num_objs, jnp.int32), CFG)
        ours = np.asarray(apply_relabel(jnp.asarray(mask), relabel))
        ref_mask, ref_num = filter_overlaps_ref(probs, box_mask, mask,
                                                n_obs, num_objs)
        np.testing.assert_array_equal(ours, ref_mask, err_msg=f"seed {seed}")
        assert int(new_num) == ref_num, f"seed {seed}"


def test_associate_matched_id_rewrites():
    probs, box_mask, mask, n_obs, num_objs = _random_case(0)
    relabel, _ = associate_instances(
        jnp.asarray(probs), jnp.asarray(box_mask), jnp.asarray(mask),
        jnp.asarray(n_obs, jnp.int32), jnp.asarray(num_objs, jnp.int32), CFG)
    relabel = np.asarray(relabel)
    # current id 1 was planted to match global id 2
    assert relabel[1] == 2
    assert relabel[0] == 0


def test_associate_all_new_ids_first_occurrence_order():
    """With an empty volume (probs=0) every current id is unmatched and gets
    fresh ids in raster order of first pixel occurrence (tsdf.cu:378-388)."""
    K = CFG.max_objects
    H, W = 8, 8
    mask = np.zeros((H, W), np.uint8)
    mask[5, 0] = 2   # id 2 first appears later in raster order...
    mask[1, 0] = 3   # ...id 3 appears first
    probs = np.zeros((H, W, K), np.float32)
    box_mask = np.zeros((H, W, K), bool)
    relabel, new_num = associate_instances(
        jnp.asarray(probs), jnp.asarray(box_mask), jnp.asarray(mask),
        jnp.asarray(4, jnp.int32), jnp.asarray(7, jnp.int32), CFG)
    relabel = np.asarray(relabel)
    assert relabel[3] == 7   # first occurrence -> first fresh id
    assert relabel[2] == 8
    assert int(new_num) == 9
