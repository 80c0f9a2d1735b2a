from slam_maskrcnn_tpu.train.trainer import Trainer, LAYER_REGEX
from slam_maskrcnn_tpu.train.checkpoint import save_params, restore_params
