from slam_maskrcnn_tpu.utils.profiling import StageTimer, trace, log_tensor
