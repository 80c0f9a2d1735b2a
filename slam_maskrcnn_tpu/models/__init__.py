from slam_maskrcnn_tpu.models.config import Config
from slam_maskrcnn_tpu.models.anchors import (compute_backbone_shapes,
                                              generate_anchors,
                                              generate_pyramid_anchors,
                                              get_anchors)
from slam_maskrcnn_tpu.models.mask_rcnn import (MaskRCNN, MaskRCNNModule,
                                                mold_image, resize_image,
                                                unmold_mask)
