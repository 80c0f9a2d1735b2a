from slam_maskrcnn_tpu.sfm.two_view import (estimate_rt_from_e, match_features,
                                            slam_two_view, triangulate)
from slam_maskrcnn_tpu.sfm.patchmatch import PatchMatch
