"""First contact with the REAL reference artifacts — one command, the day
the environment allows it (VERDICT r2 "Missing #1": gate configs 2/3 are
structurally evidenced only while this environment has zero egress and no
TUM data on disk).

Given network access OR locally staged files, this script:

1. downloads (or finds) ``mask_rcnn_coco.h5`` and STRICT-loads it — every
   model parameter written, every file layer consumed
   (``models/import_h5.py``; loader parity: ``model.py:2079-2115``,
   auto-download: ``mask_process.py:45-46`` / ``utils.py:845-855``);
2. runs single-image inference on ``bottles.jpg`` (BASELINE gate config 2,
   the ``mask_image.py`` path) and reports the detected classes;
3. fuses the first N frames of a real TUM fr2 sequence with existing mask
   PNGs (gate config 3/4; the reference driver's workload,
   ``src/SfM_CUDA/kernel.cpp:45-61``) and writes a rendered orbit frame.

Usage::

    python tools/first_contact.py --workdir /data/first_contact \
        [--weights mask_rcnn_coco.h5] [--image bottles.jpg] \
        [--tum /data/rgbd_dataset_freiburg2_desk] [--frames 10]

Every stage that lacks its artifact prints SKIP with the exact path it
wants, so partial staging still makes progress.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def stage_weights(model, path):
    from slam_maskrcnn_tpu.data.dataset import download_trained_weights

    try:
        download_trained_weights(path)
    except RuntimeError as e:
        print(f"SKIP weights: {e}")
        return False
    model.load_weights(path, by_name=True, strict=True)
    print(f"OK weights: strict-loaded {path}")
    return True


def stage_bottles(model, image_path, out_dir):
    if not os.path.exists(image_path):
        print(f"SKIP bottles: place an RGB test image at {image_path}")
        return False
    import cv2

    bgr = cv2.imread(image_path)
    rgb = np.ascontiguousarray(bgr[:, :, ::-1])
    r = model.detect([rgb])[0]
    from slam_maskrcnn_tpu.samples.coco import COCO_CLASS_NAMES

    names = [COCO_CLASS_NAMES[c] for c in r["class_ids"]]
    print(f"OK bottles: {len(names)} detections: {names}")
    with open(os.path.join(out_dir, "bottles_detections.json"), "w") as f:
        json.dump({"classes": names,
                   "scores": [float(s) for s in r["scores"]],
                   "rois": r["rois"].tolist()}, f, indent=2)
    # label-encoded mask PNG — the stage-1/stage-2 disk contract
    from slam_maskrcnn_tpu.models.mask_ops import mask_detect

    label = mask_detect(model, rgb, None)
    cv2.imwrite(os.path.join(out_dir, "bottles_mask.png"), label)
    return True


def stage_tum(model, tum_dir, frames, out_dir, use_model_masks,
              vol_dim=256):
    if not tum_dir or not os.path.isdir(tum_dir):
        print("SKIP tum: pass --tum /path/to/rgbd_dataset_freiburg2_desk "
              "(needs rgb/ depth/ groundtruth.txt; mask/ optional)")
        return False
    import cv2
    import jax.numpy as jnp

    from slam_maskrcnn_tpu.data.tum import TUMSequence
    from slam_maskrcnn_tpu.fusion import FusionConfig, SemanticFusion
    from slam_maskrcnn_tpu.fusion.splat import splat_render_orbit
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic
    from slam_maskrcnn_tpu.models.mask_ops import mask_detect

    K = make_intrinsic(520.9, 521.0, 325.1, 249.7)  # kernel.cpp:39
    seq = TUMSequence(tum_dir, max_frames=frames)
    cfg = FusionConfig(vol_dim=(vol_dim,) * 3, hist_dtype=jnp.uint16)
    fusion = SemanticFusion(K, cfg, backend="pallas")
    n = 0
    for fr in seq:
        mask = fr.get("mask")
        if mask is None:
            if not use_model_masks:
                print("SKIP tum: no mask/ PNGs; rerun with --model-masks "
                      "to generate them live")
                return False
            rgb = np.ascontiguousarray(fr["color"][:, :, ::-1])
            mask = mask_detect(model, rgb, fr["depth"])
        fusion.parse_frame(fr["depth"], fr["color"], mask,
                           fr["extrinsic"], fr.get("mean_depth"))
        n += 1
    img = np.asarray(splat_render_orbit(
        fusion.state, 0.3, fusion.mean_depth, jnp.asarray(K), 480, 640,
        cfg))
    out = os.path.join(out_dir, "tum_orbit_render.png")
    cv2.imwrite(out, img[:, :, ::-1])
    st = fusion.dense_state()
    print(f"OK tum: fused {n} frames, num_objs={int(st.num_objs)}, "
          f"misses={fusion.total_misses}, render -> {out}")
    return True


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/first_contact")
    p.add_argument("--weights", default=None,
                   help="path to mask_rcnn_coco.h5 (default workdir)")
    p.add_argument("--image", default=None,
                   help="path to bottles.jpg (default workdir)")
    p.add_argument("--tum", default=None, help="TUM fr2 sequence dir")
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--vol-dim", type=int, default=256)
    p.add_argument("--model-masks", action="store_true",
                   help="generate masks live when the sequence has none")
    a = p.parse_args(argv)

    os.makedirs(a.workdir, exist_ok=True)
    weights = a.weights or os.path.join(a.workdir, "mask_rcnn_coco.h5")
    image = a.image or os.path.join(a.workdir, "bottles.jpg")

    from slam_maskrcnn_tpu.models import MaskRCNN
    from slam_maskrcnn_tpu.samples.coco import CocoInferenceConfig

    model = MaskRCNN("inference", CocoInferenceConfig())
    got_weights = stage_weights(model, weights)
    if not got_weights:
        print("continuing with random init (fusion stage only needs masks)")
        model.init_params()
    ok_b = got_weights and stage_bottles(model, image, a.workdir)
    ok_t = stage_tum(model, a.tum, a.frames, a.workdir,
                     a.model_masks and got_weights, vol_dim=a.vol_dim)
    done = int(got_weights) + int(bool(ok_b)) + int(bool(ok_t))
    print(f"first contact: {done}/3 stages complete")
    return 0 if done == 3 else 1


if __name__ == "__main__":
    sys.exit(main())
