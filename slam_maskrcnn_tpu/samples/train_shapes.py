"""Train-on-shapes walkthrough + quality gate.

= the reference's ``samples/shapes/train_shapes.ipynb`` — the de-facto
integration test (SURVEY §4.1): train the tiny synthetic-shapes config,
then evaluate mAP@50 on held-out shapes images with
``eval.metrics.compute_ap`` and (optionally) fail below a threshold.

Runs end-to-end on one TPU chip in a few minutes (CPU works but is slow).

    python -m slam_maskrcnn_tpu.samples.train_shapes \
        --epochs 2 --steps 100 --eval-images 25 --min-map 0.5
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from slam_maskrcnn_tpu.data.dataset import load_image_gt
from slam_maskrcnn_tpu.data.shapes import ShapesConfig, ShapesDataset
from slam_maskrcnn_tpu.eval.metrics import compute_ap
from slam_maskrcnn_tpu.models import MaskRCNN


class TrainShapesConfig(ShapesConfig):
    """The train_shapes.ipynb config analog."""

    NAME = "shapes"
    IMAGES_PER_GPU = 8
    GPU_COUNT = 1
    STEPS_PER_EPOCH = 100


class InferenceShapesConfig(TrainShapesConfig):
    IMAGES_PER_GPU = 1
    DETECTION_MIN_CONFIDENCE = 0.7


def evaluate_map(model, dataset, config, image_ids, iou_threshold=0.5,
                 verbose=0):
    """mAP over a set of dataset images (the notebook's final cell)."""
    aps = []
    for image_id in image_ids:
        image, gt_class_id, gt_bbox, gt_mask, _, _ = load_image_gt(
            dataset, config, image_id, use_mini_mask=False)
        r = model.detect([image])[0]
        ap, _, _, _ = compute_ap(
            gt_bbox.astype(np.float32), gt_class_id, gt_mask,
            r["rois"].astype(np.float32), r["class_ids"], r["scores"],
            r["masks"], iou_threshold=iou_threshold)
        aps.append(ap)
        if verbose:
            print(f"  image {image_id}: AP@{iou_threshold:.2f} = {ap:.3f}")
    return float(np.mean(aps)) if aps else 0.0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--train-images", type=int, default=500)
    ap.add_argument("--eval-images", type=int, default=25)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--layers", default="heads",
                    help="heads|3+|4+|5+|all (the notebook trains heads)")
    ap.add_argument("--min-map", type=float, default=None,
                    help="exit nonzero if mAP@50 falls below this")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (tests/debug)")
    ap.add_argument("--decay-epochs", type=int, default=0,
                    help="extra epochs at lr/10 after the main schedule "
                         "(the reference's final-stage lr drop, "
                         "coco.py:514-520)")
    ap.add_argument("--augment", action="store_true",
                    help="legacy fliplr augmentation during training")
    ap.add_argument("--save", default=None,
                    help="write trained weights (Keras-layout h5) + a "
                         ".eval.json log next to it")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from slam_maskrcnn_tpu.train import Trainer

    cfg = TrainShapesConfig()
    cfg.STEPS_PER_EPOCH = args.steps
    H, W = int(cfg.IMAGE_SHAPE[0]), int(cfg.IMAGE_SHAPE[1])

    train_ds = ShapesDataset()
    train_ds.load_shapes(args.train_images, H, W, seed=args.seed)
    train_ds.prepare()
    val_ds = ShapesDataset()
    val_ds.load_shapes(args.eval_images, H, W, seed=args.seed + 1)
    val_ds.prepare()

    model = MaskRCNN("training", cfg)
    model.init_params(args.seed)
    trainer = Trainer(model, cfg)
    t0 = time.time()
    trainer.train(train_ds, learning_rate=args.lr, epochs=args.epochs,
                  layers=args.layers, augment=args.augment,
                  checkpoint=False)
    if args.decay_epochs:
        lr = args.lr if args.lr is not None else cfg.LEARNING_RATE
        trainer.train(train_ds, learning_rate=lr / 10.0,
                      epochs=args.epochs + args.decay_epochs,
                      layers=args.layers, augment=args.augment,
                      checkpoint=False)
    train_s = time.time() - t0

    # move the trained params into an inference-mode model
    icfg = InferenceShapesConfig()
    inf = MaskRCNN("inference", icfg)
    inf.params = model.params
    t0 = time.time()
    m_ap = evaluate_map(inf, val_ds, icfg, val_ds.image_ids, verbose=1)
    eval_s = time.time() - t0

    summary = {
        "metric": "shapes_map50",
        "value": round(m_ap, 4),
        "unit": "mAP@0.5",
        "train_seconds": round(train_s, 1),
        "eval_seconds": round(eval_s, 1),
        "epochs": args.epochs + args.decay_epochs,
        "steps_per_epoch": args.steps,
        "layers": args.layers,
    }
    print(json.dumps(summary))
    if args.save:
        from slam_maskrcnn_tpu.models.import_h5 import save_h5_weights

        save_h5_weights(args.save, model.params)
        with open(args.save + ".eval.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(f"saved weights to {args.save}")
    if args.min_map is not None and m_ap < args.min_map:
        raise SystemExit(
            f"mAP@50 {m_ap:.3f} below the {args.min_map} gate")


if __name__ == "__main__":
    main()
