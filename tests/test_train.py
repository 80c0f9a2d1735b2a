"""Training tests: shapes dataset generation, data pipeline shapes, one
train step reduces loss on a tiny config (the reference's train_shapes
integration test, SURVEY §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_maskrcnn_tpu.data.dataset import data_generator, load_image_gt
from slam_maskrcnn_tpu.data.shapes import ShapesConfig, ShapesDataset
from slam_maskrcnn_tpu.models import MaskRCNN
from slam_maskrcnn_tpu.train import Trainer, LAYER_REGEX
from slam_maskrcnn_tpu.train.trainer import trainable_mask


class TrainConfig(ShapesConfig):
    NAME = "shapes_train_test"
    IMAGES_PER_GPU = 2
    GPU_COUNT = 1
    IMAGE_MIN_DIM = 128
    IMAGE_MAX_DIM = 128
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    TRAIN_ROIS_PER_IMAGE = 16
    POST_NMS_ROIS_TRAINING = 64
    PRE_NMS_LIMIT = 256
    MAX_GT_INSTANCES = 4
    STEPS_PER_EPOCH = 2
    COMPUTE_DTYPE = "float32"


def test_shapes_dataset_loads():
    ds = ShapesDataset()
    ds.load_shapes(8, 128, 128, seed=1)
    ds.prepare()
    assert ds.num_images == 8
    img = ds.load_image(0)
    assert img.shape == (128, 128, 3)
    masks, ids = ds.load_mask(0)
    assert masks.shape[:2] == (128, 128)
    assert masks.shape[2] == len(ids)
    assert (ids >= 1).all() and (ids <= 3).all()


def test_data_generator_batch_contract():
    cfg = TrainConfig()
    ds = ShapesDataset()
    ds.load_shapes(6, 128, 128, seed=2)
    ds.prepare()
    gen = data_generator(ds, cfg, shuffle=True, seed=0)
    batch = next(gen)
    B = cfg.BATCH_SIZE
    assert batch["images"].shape == (B, 128, 128, 3)
    A = batch["rpn_match"].shape[1]
    assert batch["rpn_bbox"].shape == (B, A, 4)
    assert batch["gt_boxes"].shape == (B, cfg.MAX_GT_INSTANCES, 4)
    assert batch["gt_masks"].shape[:2] == (B, cfg.MAX_GT_INSTANCES)
    assert batch["gt_boxes"].max() <= 1.0
    assert (batch["rpn_match"] == 1).sum() > 0


def test_trainable_mask_heads_freezes_backbone():
    cfg = TrainConfig()
    model = MaskRCNN("training", cfg)
    model.init_params(0)
    mask = trainable_mask(model.params["params"], LAYER_REGEX["heads"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen = [p for p, v in flat if v == 0.0]
    live = [p for p, v in flat if v == 1.0]
    assert frozen and live
    frozen_names = {str(k.key) for p in frozen for k in p}
    live_names = {str(k.key) for p in live for k in p}
    assert any(n.startswith("res2") or n == "conv1" for n in frozen_names)
    assert any(n.startswith("rpn") or n.startswith("mrcnn")
               for n in live_names)


@pytest.mark.slow
def test_train_step_reduces_loss():
    cfg = TrainConfig()
    ds = ShapesDataset()
    ds.load_shapes(6, 128, 128, seed=3)
    ds.prepare()
    model = MaskRCNN("training", cfg)
    model.init_params(0)
    trainer = Trainer(model, cfg)
    hist = trainer.train(ds, learning_rate=0.002, epochs=2, layers="all",
                         steps_per_epoch=3, verbose=0, checkpoint=False)
    assert len(hist) == 2
    assert np.isfinite(hist).all()
    # genuine descent, not just "not exploding": the first epochs from
    # random init drop steeply (TPU run: 28.8 -> 8.9 over 100-step epochs;
    # 3-step epochs still fall clearly)
    assert hist[-1] < hist[0] * 0.85, f"loss did not descend: {hist}"


def test_train_bn_mode_trains_and_updates_stats():
    """TRAIN_BN=True (the reference's config.TRAIN_BN -> train_bn wiring,
    model.py:1890/2036): batch-stats BN in the training graph, running
    averages updated through the step. From random init this is the mode
    that keeps deep configs finite (a frozen-BN resnet101@1024^2
    amplified activations to NaN within 10 steps — see trainer.py)."""
    class BNConfig(TrainConfig):
        NAME = "shapes_train_bn"
        TRAIN_BN = True

    cfg = BNConfig()
    ds = ShapesDataset()
    ds.load_shapes(6, 128, 128, seed=3)
    ds.prepare()
    model = MaskRCNN("training", cfg)
    model.init_params(0)
    bs0 = jax.tree.map(lambda x: np.asarray(x).copy(),
                       model.params["batch_stats"])
    trainer = Trainer(model, cfg)
    hist = trainer.train(ds, learning_rate=0.002, epochs=1, layers="all",
                         steps_per_epoch=3, verbose=0, checkpoint=False)
    assert np.isfinite(hist).all()
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(bs0),
                        jax.tree.leaves(model.params["batch_stats"])))
    assert changed, "running BN stats did not update in TRAIN_BN mode"


def test_train_step_data_parallel_mesh():
    """GPU_COUNT>1 engages the device mesh (8 virtual CPU devices)."""
    import jax

    class DPConfig(TrainConfig):
        NAME = "shapes_dp_test"
        GPU_COUNT = 4
        IMAGES_PER_GPU = 1

    cfg = DPConfig()
    assert cfg.BATCH_SIZE == 4
    ds = ShapesDataset()
    ds.load_shapes(8, 128, 128, seed=4)
    ds.prepare()
    model = MaskRCNN("training", cfg)
    model.init_params(0)
    trainer = Trainer(model, cfg)
    hist = trainer.train(ds, learning_rate=0.001, epochs=1, layers="heads",
                         steps_per_epoch=2, verbose=0, checkpoint=False)
    assert np.isfinite(hist).all()
    # params ended up replicated across the mesh
    leaf = jax.tree.leaves(model.params)[0]
    assert len(leaf.sharding.device_set) == 4


def test_epoch_resume_from_checkpoint(tmp_path):
    """Saving at epoch N and loading 'last' resumes the epoch counter —
    the reference's filename-regex resume (model.py:2208-2242)."""
    from slam_maskrcnn_tpu.train import checkpoint as ckpt

    model = MaskRCNN("training", TrainConfig())
    variables = model.init_params(0)
    model.params = variables
    rd = ckpt.run_dir(str(tmp_path), "shapes_train_test")
    p = ckpt.checkpoint_path(rd, "shapes_train_test", 3)
    ckpt.save_params(variables, p)
    assert ckpt.epoch_from_path(p) == 3

    model2 = MaskRCNN("training", TrainConfig())
    tr = Trainer(model2)
    loaded = tr.load_weights("last", model_dir=str(tmp_path))
    assert loaded.endswith("_0003")
    assert tr.epoch == 3
    assert tr.run_directory == rd
    a = jax.tree.leaves(variables)[0]
    b = jax.tree.leaves(model2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shapes_map_gate_machinery():
    """The train_shapes mAP@50 gate, validated deterministically: a model
    that detects the ground truth scores ~1.0, a blind model scores 0.
    (Actual trained convergence is gated on TPU: mAP@50 = 0.73 after 1400
    steps from random init — PERFORMANCE.md.)"""
    from slam_maskrcnn_tpu.data.dataset import load_image_gt
    from slam_maskrcnn_tpu.samples.train_shapes import (
        InferenceShapesConfig, evaluate_map)

    cfg = InferenceShapesConfig()
    ds = ShapesDataset()
    ds.load_shapes(4, cfg.IMAGE_SHAPE[0], cfg.IMAGE_SHAPE[1], seed=7)
    ds.prepare()

    class Oracle:
        def detect(self, images):
            _, cid, bbox, mask, _, _ = load_image_gt(
                ds, cfg, self._id, use_mini_mask=False)
            return [dict(rois=bbox.astype(np.float32), class_ids=cid,
                         scores=np.full(len(cid), 0.99, np.float32),
                         masks=mask)]

    class Blind:
        def detect(self, images):
            return [dict(rois=np.zeros((0, 4), np.float32),
                         class_ids=np.zeros((0,), np.int32),
                         scores=np.zeros((0,), np.float32),
                         masks=np.zeros(tuple(cfg.IMAGE_SHAPE[:2]) + (0,),
                                        bool))]

    oracle = Oracle()
    aps = []
    for i in ds.image_ids:
        oracle._id = i
        aps.append(evaluate_map(oracle, ds, cfg, [i]))
    assert np.mean(aps) > 0.99
    assert evaluate_map(Blind(), ds, cfg, ds.image_ids) == 0.0
