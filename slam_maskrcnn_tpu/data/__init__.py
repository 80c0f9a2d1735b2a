from slam_maskrcnn_tpu.data.tum import (
    Trajectory,
    TUMSequence,
    filename_timestamp,
    match_timestamps,
    mean_depth,
    pose_matrix,
    parse_extrinsic,
    read_trajectory,
    slerp,
)
