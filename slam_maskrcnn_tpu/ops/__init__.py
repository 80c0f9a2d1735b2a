from slam_maskrcnn_tpu.ops.boxes import (apply_box_deltas, box_refinement,
                                         clip_boxes, compute_iou_matrix,
                                         denorm_boxes, norm_boxes)
from slam_maskrcnn_tpu.ops.nms import non_max_suppression, nms_padded
from slam_maskrcnn_tpu.ops.roi_align import crop_and_resize, pyramid_roi_align
