from slam_maskrcnn_tpu.fusion.state import FusionConfig, TSDFState, init_state, init_from_first_frame
from slam_maskrcnn_tpu.fusion.fuse import fuse_frame
from slam_maskrcnn_tpu.fusion.raycast import ray_march, back_project_probe, render_orbit, render
from slam_maskrcnn_tpu.fusion.associate import associate_instances, apply_relabel
from slam_maskrcnn_tpu.fusion.pipeline import SemanticFusion, fusion_step, fusion_step_blocked, fuse_sequence
