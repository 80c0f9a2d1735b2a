"""TUM frontend tests: trajectory parsing, pose math, timestamp matching."""

import numpy as np
import pytest

from slam_maskrcnn_tpu.data.tum import (Trajectory, filename_timestamp,
                                        match_timestamps, mean_depth,
                                        parse_extrinsic, pose_matrix,
                                        quaternion_matrix, read_trajectory,
                                        slerp)


def test_filename_timestamp_truncation():
    # 5-digit truncation quirk: kernel.cpp:53 / utils.cu:72
    assert abs(filename_timestamp("/a/b/1311871923.004312.png")
               - 71923.004312) < 1e-6


def test_quaternion_matrix_identity_and_roundtrip():
    np.testing.assert_allclose(quaternion_matrix([0, 0, 0, 1]), np.eye(3),
                               atol=1e-12)
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = quaternion_matrix(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def test_parse_extrinsic_is_world_to_camera():
    # camera at (1,2,3) with identity rotation: world->camera maps the
    # camera position to the origin (utils.cu:23 returns the inverse)
    E = parse_extrinsic([1, 2, 3, 0, 0, 0, 1])
    p = E @ np.array([1, 2, 3, 1.0])
    np.testing.assert_allclose(p[:3], 0, atol=1e-6)


def test_slerp_endpoints_and_midpoint():
    q1 = np.array([0, 0, 0, 1.0])
    q2 = np.array([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)])  # 90 deg z
    np.testing.assert_allclose(slerp(q1, q2, 0.0), q1, atol=1e-9)
    np.testing.assert_allclose(slerp(q1, q2, 1.0), q2, atol=1e-9)
    mid = slerp(q1, q2, 0.5)
    expect = np.array([0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)])
    np.testing.assert_allclose(mid / np.linalg.norm(mid), expect, atol=1e-9)


def test_read_trajectory_and_lookup(tmp_path):
    f = tmp_path / "groundtruth.txt"
    f.write_text(
        "# comment line\n"
        "1311871922.00 0 0 0 0 0 0 1\n"
        "garbage line\n"
        "1311871923.50 1 0 0 0 0 0 1\n"
        "1311871925.00 2 0 0 0 0 0 1\n")
    traj = read_trajectory(str(f))
    assert len(traj.timestamps) == 3
    # keys are fmod(ts, 1e5): 71922, 71923.5, 71925
    np.testing.assert_allclose(traj.timestamps,
                               [71922.0, 71923.5, 71925.0])
    # lower_bound: first key >= ts
    np.testing.assert_allclose(traj.lower_bound(71923.0)[:3], [1, 0, 0])
    np.testing.assert_allclose(traj.lower_bound(71923.5)[:3], [1, 0, 0])
    # interpolation: midpoint between samples 1 and 2
    pose = traj.interpolate(71924.25)
    np.testing.assert_allclose(pose[:3], [1.5, 0, 0])


def test_match_timestamps_two_pointer():
    depth_ts = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    mask_ts = np.array([2.0, 4.0, 5.0])
    pairs = match_timestamps(depth_ts, mask_ts)
    assert pairs == [(1, 0), (3, 1), (4, 2)]
    pairs = match_timestamps(depth_ts, mask_ts, begin=3.0, end=4.5)
    assert pairs == [(3, 1)]
    pairs = match_timestamps(depth_ts, mask_ts, max_frames=2)
    assert pairs == [(1, 0), (3, 1)]


def test_mean_depth():
    d = np.zeros((4, 4), np.uint16)
    d[0, 0] = 5000
    d[1, 1] = 10000
    assert abs(mean_depth(d) - 1.5) < 1e-9
    assert mean_depth(np.zeros((2, 2), np.uint16)) == 0.0


def test_filter_gaussian_three_sigma():
    """TSDF_CPP main.cpp:40-91 semantics: outliers beyond 3 sigma of the
    nonzero population zero out; the returned mean is over survivors in
    raw units. Verified against a literal loop transcription."""
    from slam_maskrcnn_tpu.data.tum import filter_gaussian

    rng = np.random.RandomState(0)
    depth = rng.normal(5000, 100, (40, 50)).astype(np.uint16)
    depth[0, :10] = 0                      # invalid pixels stay invalid
    depth[5, 5] = 30000                    # gross outlier
    depth[6, 6] = 1                        # low outlier

    out, mean = filter_gaussian(depth)

    # literal single-pass reference
    vals = depth[depth > 0].astype(np.float64)
    m0, s0 = vals.mean(), vals.std()
    expect = depth.copy()
    kill = (depth > 0) & (np.abs(depth.astype(np.float64) - m0) > 3 * s0)
    expect[kill] = 0
    np.testing.assert_array_equal(out, expect)
    assert out[5, 5] == 0 and out[6, 6] == 0
    assert out[0, 0] == 0
    sur = expect[expect > 0].astype(np.float64)
    assert abs(mean - sur.mean()) < 1e-9
    # repeated application converges (reference: "can be performed
    # multiple times")
    out2, _ = filter_gaussian(depth, iters=3)
    assert (out2 > 0).sum() <= (out > 0).sum()
