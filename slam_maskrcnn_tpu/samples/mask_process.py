"""Batch mask generation — the ``mask_process.py`` pipeline glue.

= ``Mask_RCNN/mask_process.py``: COCO inference config (GPU_COUNT=1,
IMAGES_PER_GPU=1, :57-61), loop sorted rgb/*.png -> mask_detect -> write
label-encoded mask/<name>.png (:94-105). This produces stage 2's input
contract (pixel value = instance id, 0 = background).
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rgb", required=True, help="input rgb folder")
    p.add_argument("--out", required=True, help="output mask folder")
    p.add_argument("--depth", default=None,
                   help="optional depth folder for depth filtering")
    p.add_argument("--weights", default=None,
                   help=".h5 (Keras) or orbax checkpoint; random init if "
                        "omitted (for smoke tests)")
    a = p.parse_args()

    from slam_maskrcnn_tpu.models import MaskRCNN
    from slam_maskrcnn_tpu.models.mask_ops import batch_mask_process
    from slam_maskrcnn_tpu.samples.coco import CocoInferenceConfig

    model = MaskRCNN("inference", CocoInferenceConfig())
    if a.weights:
        model.load_weights(a.weights, by_name=True)
    else:
        model.init_params()
    n = batch_mask_process(model, a.rgb, a.out, a.depth)
    print(f"wrote {n} masks to {a.out}")


if __name__ == "__main__":
    main()
