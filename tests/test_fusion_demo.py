"""End-to-end TUM driver test: write a synthetic sequence to disk in TUM
layout (rgb/ depth/ mask/ groundtruth.txt), run the fusion_demo driver
(the kernel.cpp path) and check the fused volume + orbit render."""

import os

import numpy as np
import pytest

from slam_maskrcnn_tpu.data.synthetic import default_scene, render_frame
from slam_maskrcnn_tpu.data.tum import pose_matrix
from slam_maskrcnn_tpu.fusion.state import make_intrinsic


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("tum_fake")
    for d in ("rgb", "depth", "mask"):
        os.makedirs(root / d)
    H, W = 120, 160
    K = make_intrinsic(130.0, 130.0, W / 2, H / 2)
    scene = default_scene()
    base_ts = 1311868164.0  # -> fmod 68164.x, inside the reference window
    lines = []
    for i in range(6):
        ts = base_ts + i * 0.05
        # small camera translation; pose is camera-to-world in groundtruth
        tx = 0.02 * i
        pose = [tx, 0, 0, 0, 0, 0, 1]
        E = np.linalg.inv(pose_matrix(pose))  # world->camera
        depth, color, mask = render_frame(scene, E, K, H, W)
        name = f"{ts:.6f}.png"
        cv2.imwrite(str(root / "depth" / name), depth)
        cv2.imwrite(str(root / "rgb" / name), color)
        cv2.imwrite(str(root / "mask" / name), mask)
        lines.append(f"{ts:.6f} " + " ".join(str(v) for v in pose))
    (root / "groundtruth.txt").write_text(
        "# ground truth trajectory\n" + "\n".join(lines) + "\n")
    return str(root)


def test_tum_sequence_loads(tum_dir):
    from slam_maskrcnn_tpu.data.tum import TUMSequence

    seq = TUMSequence(tum_dir, begin=68164.0, end=68170.0, max_frames=100)
    assert len(seq) == 6
    fr = seq[0]
    assert fr["depth"].dtype == np.uint16
    assert fr["mask"].max() >= 1
    assert fr["extrinsic"].shape == (4, 4)
    # world->camera of a translated camera maps its position to origin
    cam_pos = np.array([0.0, 0, 0, 1])
    np.testing.assert_allclose((fr["extrinsic"] @ cam_pos)[:3], 0, atol=1e-5)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_fusion_demo_end_to_end(tum_dir, backend):
    from slam_maskrcnn_tpu.samples.fusion_demo import run

    fusion, frames = run(
        tum_dir, begin=68164.0, end=68170.0, max_frames=100, vol_dim=64,
        backend=backend, intrinsics=(130.0, 130.0, 80.0, 60.0),
        orbit_frames=2, verbose=False)
    state = fusion.dense_state()
    assert int(state.n_obs) == 5  # frame 0 init-only
    assert int(state.num_objs) >= 3  # bg + 2 spheres
    wt = np.asarray(state.weight)
    assert wt.max() >= 4
    assert len(frames) == 2
    assert any((f.max(-1) > 0).sum() > 20 for f in frames)
