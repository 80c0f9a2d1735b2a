"""Training loop: SGD+momentum, gradient clipping, layer freezing, L2.

= ``MaskRCNN.train`` / ``compile`` / ``set_trainable``
(``Mask_RCNN/mrcnn/model.py:2117-2330``): SGD(lr, momentum=0.9,
clipnorm=5), weight decay as an additive L2 on conv/dense kernels
(model.py:2134-2141), layer-selection regexes (model.py:2269-2280), dated
run dirs with per-epoch checkpoints.

TPU-native: one jitted train step over a data-parallel device mesh — batch
sharded on axis 0, params replicated (replaces ``parallel_model.py``'s
graph-replication towers, SURVEY §2.5); gradients are reduced by XLA
automatically through the sharded-batch loss mean.
"""

from __future__ import annotations

import os
import re
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from slam_maskrcnn_tpu.models.anchors import get_anchors
from slam_maskrcnn_tpu.models.losses import total_loss
from slam_maskrcnn_tpu.train import checkpoint as ckpt

# layer-selection regexes, reference model.py:2269-2280
LAYER_REGEX = {
    "heads": r"(mrcnn\_.*)|(rpn\_.*)|(fpn\_.*)",
    "3+": r"(res3.*)|(bn3.*)|(res4.*)|(bn4.*)|(res5.*)|(bn5.*)|(mrcnn\_.*)|(rpn\_.*)|(fpn\_.*)",
    "4+": r"(res4.*)|(bn4.*)|(res5.*)|(bn5.*)|(mrcnn\_.*)|(rpn\_.*)|(fpn\_.*)",
    "5+": r"(res5.*)|(bn5.*)|(mrcnn\_.*)|(rpn\_.*)|(fpn\_.*)",
    "all": ".*",
}


def _path_matches(path, regex):
    pat = re.compile(regex)
    return any(pat.fullmatch(str(p)) or pat.match(str(p)) for p in path)


def trainable_mask(params, layers_regex: str):
    """Pytree of 0/1 floats: 1 where the param's path matches the regex
    (grad flows), 0 elsewhere (frozen). fpn_* covers both the FPN convs and
    our fpn_classifier/fpn_mask module prefixes, as in the reference where
    those layer names start with mrcnn_/fpn_."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def mask_one(path):
        keys = [getattr(k, "key", str(k)) for k in path]
        return 1.0 if any(re.match(layers_regex, str(k)) for k in keys) else 0.0

    leaves, treedef = jax.tree_util.tree_flatten(params)
    masks = [mask_one(p) for p, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, masks)


def l2_regularization(params, weight_decay: float):
    """L2 on kernels only, scaled by size as the reference does
    (model.py:2137-2141 divides by tf.size)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        if keys and keys[-1] == "kernel":
            total = total + jnp.sum(leaf.astype(jnp.float32) ** 2) / leaf.size
    return weight_decay * total


class Trainer:
    """Drives training of a MaskRCNN wrapper (mode='training')."""

    def __init__(self, model, config=None):
        self.model = model
        self.config = config or model.config
        self.run_directory = None
        self.epoch = 0

    def _make_step(self, lr: float, layers_regex: str):
        cfg = self.config
        module = self.model.module
        mask = None  # built lazily from params

        opt = optax.chain(
            optax.clip_by_global_norm(cfg.GRADIENT_CLIP_NORM),
            optax.sgd(lr, momentum=cfg.LEARNING_MOMENTUM),
        )

        # TRAIN_BN: the reference threads config.TRAIN_BN into every
        # BatchNorm of its training graph (model.py train_bn=...). False
        # (the reference default) freezes BN to its running stats — sane
        # ONLY with pretrained weights: from RANDOM init a frozen-BN
        # resnet101 at 1024^2 amplifies activations layer over layer
        # until the RPN logits reach +-200 and the losses NaN within ten
        # steps (measured; shapes' resnet50@128^2 merely started at loss
        # ~29 and survived). True runs batch-stats BN and updates the
        # running averages through the step.
        train_bn = bool(getattr(cfg, "TRAIN_BN", False))

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(variables, opt_state, rng, batch):
            params = variables["params"]
            frozen_mask = trainable_mask(params, layers_regex)

            def loss_fn(p):
                v = dict(variables, params=p)
                kwargs = dict(train_rois=cfg.TRAIN_ROIS_PER_IMAGE,
                              positive_ratio=cfg.ROI_POSITIVE_RATIO,
                              method=module.train_forward)
                args = (batch["images"], batch["anchors"], rng,
                        batch["gt_class_ids"], batch["gt_boxes"],
                        batch["gt_masks"])
                if train_bn:
                    (outputs, targets), mut = module.apply(
                        v, *args, train_bn=True,
                        mutable=["batch_stats"], **kwargs)
                else:
                    outputs, targets = module.apply(v, *args, **kwargs)
                    mut = {}
                targets["rpn_match"] = batch["rpn_match"]
                targets["rpn_bbox"] = batch["rpn_bbox"]
                targets["active_class_ids"] = batch["active_class_ids"]
                loss, parts = total_loss(outputs, targets, cfg.LOSS_WEIGHTS)
                loss = loss + l2_regularization(p, cfg.WEIGHT_DECAY)
                return loss, (parts, mut)

            (loss, (parts, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = jax.tree.map(lambda g, m: g * m, grads, frozen_mask)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            variables = dict(variables, params=params)
            if train_bn and "batch_stats" in mut:
                variables["batch_stats"] = mut["batch_stats"]
            return variables, opt_state, loss, parts

        return step, opt

    def load_weights(self, path: str = "last", model_dir: str = "./logs"):
        """Restore params from a checkpoint and resume its epoch counter
        (= model.load_weights + the set_log_dir filename-regex resume,
        model.py:2079-2115, 2208-2242). path='last' discovers the newest
        run's newest checkpoint via find_last."""
        if path == "last":
            path = ckpt.find_last(model_dir, self.config.NAME or "model")
        if self.model.params is None:
            self.model.init_params()
        self.model.params = ckpt.restore_params(path, self.model.params)
        self.epoch = ckpt.epoch_from_path(path)
        self.run_directory = os.path.dirname(os.path.abspath(path))
        return path

    def train(self, train_dataset, val_dataset=None, learning_rate=None,
              epochs=1, layers="all", augment=False, steps_per_epoch=None,
              verbose=1, checkpoint=True, augmentation=None):
        """= MaskRCNN.train (model.py:2244-2330). layers: regex or one of
        heads|3+|4+|5+|all. Trains from self.epoch to `epochs`.
        `augmentation`: a data.augment.Augmenter (the imgaug-hook
        equivalent of model.py:1241-1270)."""
        from slam_maskrcnn_tpu.data.dataset import data_generator

        cfg = self.config
        lr = learning_rate or cfg.LEARNING_RATE
        layers_regex = LAYER_REGEX.get(layers, layers)
        steps = steps_per_epoch or cfg.STEPS_PER_EPOCH

        if self.model.params is None:
            self.model.init_params()
        if self.run_directory is None:
            self.run_directory = ckpt.run_dir("./logs", cfg.NAME or "model")

        step_fn, opt = self._make_step(lr, layers_regex)
        opt_state = opt.init(self.model.params["params"])

        # data parallelism over a device mesh when GPU_COUNT > 1 (the
        # reference's ParallelModel trigger, model.py:2047-2050): batch
        # sharded on its leading axis, params/optimizer replicated — XLA
        # all-reduces the gradients over the mesh
        mesh = None
        if cfg.GPU_COUNT > 1:
            from slam_maskrcnn_tpu.parallel import make_mesh, shard_params
            mesh = make_mesh(cfg.GPU_COUNT)
            self.model.params = shard_params(self.model.params, mesh)
            opt_state = shard_params(opt_state, mesh)

        anchors = jnp.asarray(get_anchors(cfg, cfg.IMAGE_SHAPE))
        gen = data_generator(train_dataset, cfg, shuffle=True,
                             augment=augment, augmentation=augmentation)
        rng = jax.random.PRNGKey(self.epoch)
        variables = self.model.params
        history = []
        for epoch in range(self.epoch, epochs):
            t0 = time.time()
            losses = []
            for s in range(steps):
                batch = next(gen)
                rng, sub = jax.random.split(rng)
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                if mesh is not None:
                    from slam_maskrcnn_tpu.parallel import shard_batch
                    jb = shard_batch(jb, mesh)
                jb["anchors"] = anchors
                variables, opt_state, loss, parts = step_fn(
                    variables, opt_state, sub, jb)
                losses.append(float(loss))
            mean_loss = float(np.mean(losses))
            history.append(mean_loss)
            if verbose:
                part_s = " ".join(f"{k}={float(v):.3f}"
                                  for k, v in sorted(parts.items()))
                print(f"epoch {epoch + 1}/{epochs} loss {mean_loss:.4f} "
                      f"({time.time() - t0:.1f}s, lr {lr}, layers {layers}) "
                      f"[{part_s}]")
            if checkpoint:
                ckpt.save_params(
                    variables,
                    ckpt.checkpoint_path(self.run_directory,
                                         cfg.NAME or "model", epoch + 1))
        self.model.params = variables
        self.epoch = epochs
        return history
