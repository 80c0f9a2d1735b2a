from slam_maskrcnn_tpu.eval.metrics import (compute_ap, compute_ap_range,
                                            compute_matches, compute_recall)
from slam_maskrcnn_tpu.eval.rle import (rle_encode, rle_decode, rle_area,
                                        rle_iou, rle_merge, mask_to_rle_string)
from slam_maskrcnn_tpu.eval.coco_api import COCO
