"""LivePipeline.run_device: the double-buffered device-resident streaming
path (device-side molding, detect -> label-encode -> fuse with no
mid-stream readbacks) runs end to end at tiny scale."""

import jax.numpy as jnp
import numpy as np

from slam_maskrcnn_tpu.data.synthetic import default_scene, make_sequence
from slam_maskrcnn_tpu.fusion import FusionConfig
from slam_maskrcnn_tpu.fusion.state import make_intrinsic
from slam_maskrcnn_tpu.models import MaskRCNN
from slam_maskrcnn_tpu.samples.live_pipeline import LivePipeline
from slam_maskrcnn_tpu.models import Config


class TinyConfig(Config):
    NAME = "tiny"
    BACKBONE = "resnet50"
    IMAGE_MIN_DIM = 128
    IMAGE_MAX_DIM = 128
    NUM_CLASSES = 4
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    POST_NMS_ROIS_INFERENCE = 50
    PRE_NMS_LIMIT = 200
    DETECTION_MAX_INSTANCES = 10
    IMAGES_PER_GPU = 1
    GPU_COUNT = 1
    DETECTION_MIN_CONFIDENCE = 0.0
    COMPUTE_DTYPE = "float32"


def test_run_device_end_to_end():
    H, W = 96, 128
    K4 = make_intrinsic(100.0, 100.0, W / 2, H / 2)
    frames = make_sequence(default_scene(), K4, H, W, n_frames=4)
    model = MaskRCNN("inference", TinyConfig())
    model.init_params(0)
    pipe = LivePipeline(model, K4,
                        FusionConfig(vol_dim=(64,) * 3,
                                     hist_dtype=jnp.uint16),
                        backend="pallas", use_depth_filter=False)
    fps = pipe.run_device(frames, verbose=False)
    assert pipe.frames_done == 4
    assert fps > 0
    st = pipe.fusion.state
    assert int(st.n_obs) == 3          # frame 0 only initializes
    assert int(jnp.sum(st.weight)) > 0
