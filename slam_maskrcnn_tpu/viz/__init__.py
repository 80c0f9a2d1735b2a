from slam_maskrcnn_tpu.viz.visualize import (apply_mask, display_instances,
                                             draw_boxes, random_colors)
from slam_maskrcnn_tpu.viz.viewer import Viewer
