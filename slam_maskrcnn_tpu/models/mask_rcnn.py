"""Mask R-CNN — full model assembly + user-facing API.

TPU-native re-design of the reference ``MaskRCNN`` class
(``Mask_RCNN/mrcnn/model.py:1812-2672``). The compute graph is one Flax
module jitted end-to-end (backbone -> FPN -> RPN -> proposals -> heads ->
detections -> masks) with static shapes throughout; host-side molding
(resize/pad/meta) and unmolding (full-size mask paste) bracket it exactly
like the reference's ``mold_inputs``/``unmold_detections``
(``model.py:2332-2434``).

API parity: ``MaskRCNN(mode, config, model_dir)``, ``detect(images)``
returning [{rois, class_ids, scores, masks}], ``load_weights``,
``find_last`` (``model.py:1812, 2436-2492, 2079, 2054``).
"""

from __future__ import annotations

import datetime
import os
import re
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from slam_maskrcnn_tpu.models.anchors import get_anchors
from slam_maskrcnn_tpu.models.backbone import FPN, ResNet
from slam_maskrcnn_tpu.models.config import Config
from slam_maskrcnn_tpu.models.detection import detection_layer
from slam_maskrcnn_tpu.models.heads import FPNClassifier, MaskHead
from slam_maskrcnn_tpu.models.proposal import generate_proposals
from slam_maskrcnn_tpu.models.rpn import RPNHead
from slam_maskrcnn_tpu.ops.roi_align import (pyramid_roi_align,
                                             pyramid_roi_align_auto)


class MaskRCNNModule(nn.Module):
    """The jittable graph. Inference returns (detections [B, D, 6],
    masks [B, D, 28, 28, C]); training mode returns the head outputs needed
    by the losses (see models/losses.py)."""

    num_classes: int
    backbone: str = "resnet101"
    image_shape: tuple[int, int] = (1024, 1024)
    pool_size: int = 7
    mask_pool_size: int = 14
    fc_size: int = 1024
    top_down: int = 256
    anchors_per_location: int = 3
    anchor_stride: int = 1
    proposal_count: int = 1000
    rpn_nms_threshold: float = 0.7
    pre_nms_limit: int = 6000
    detection_max_instances: int = 100
    detection_min_confidence: float = 0.7
    detection_nms_threshold: float = 0.3
    rpn_bbox_std: tuple = (0.1, 0.1, 0.2, 0.2)
    bbox_std: tuple = (0.1, 0.1, 0.2, 0.2)
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.resnet = ResNet(self.backbone, self.dtype, name="resnet")
        self.fpn = FPN(self.top_down, self.dtype, name="fpn")
        self.rpn = RPNHead(self.anchors_per_location, self.anchor_stride,
                           self.dtype, name="rpn_model")
        self.classifier = FPNClassifier(self.num_classes, self.pool_size,
                                        self.fc_size, self.dtype,
                                        name="fpn_classifier")
        self.mask_head = MaskHead(self.num_classes, self.dtype,
                                  name="fpn_mask")

    def features(self, images, train: bool = False):
        c2, c3, c4, c5 = self.resnet(images, train)
        return self.fpn(c2, c3, c4, c5)

    def rpn_outputs(self, pyramid):
        outs = [self.rpn(p) for p in pyramid]
        logits = jnp.concatenate([o[0] for o in outs], axis=1)
        probs = jnp.concatenate([o[1] for o in outs], axis=1)
        bbox = jnp.concatenate([o[2] for o in outs], axis=1)
        return logits, probs, bbox

    def __call__(self, images, anchors, windows, train: bool = False):
        """Inference graph. images [B,H,W,3] molded f32; anchors [A,4]
        normalized; windows [B,4] normalized."""
        pyramid = self.features(images, train)
        mrcnn_feats = pyramid[:4]
        _, rpn_probs, rpn_bbox = self.rpn_outputs(pyramid)
        proposals, _ = generate_proposals(
            rpn_probs, rpn_bbox, anchors, self.proposal_count,
            self.rpn_nms_threshold, self.pre_nms_limit, self.rpn_bbox_std)

        # inference uses the backend-dispatched ROIAlign (Pallas on TPU).
        # The Pallas call is looped over the (static) batch instead of
        # vmapped: Pallas auto-batching gives the kernel's 1-D SMEM
        # operands a [B, n] block shape that Mosaic rejects for B > 1,
        # and the kernel is one big fused program per image anyway — the
        # batch>1 amortization win lives in the SMALL XLA ops around it,
        # which stay under vmap (batched detect: the north-star chunk
        # hoists detect out of its scan at B=chunk).
        def roi_align_batched(feats, boxes, pool):
            per = [pyramid_roi_align_auto(tuple(f[b] for f in feats),
                                          boxes[b], pool, self.image_shape)
                   for b in range(boxes.shape[0])]
            return per[0][None] if len(per) == 1 else jnp.stack(per)

        pooled = roi_align_batched(mrcnn_feats, proposals, self.pool_size)
        logits, probs, bbox = jax.vmap(
            lambda p: self.classifier(p, train))(pooled)

        detections, det_valid = detection_layer(
            proposals, probs, bbox, windows,
            max_instances=self.detection_max_instances,
            min_confidence=self.detection_min_confidence,
            nms_threshold=self.detection_nms_threshold,
            bbox_std=self.bbox_std)

        mpooled = roi_align_batched(mrcnn_feats, detections[..., :4],
                                    self.mask_pool_size)
        masks = jax.vmap(lambda p: self.mask_head(p, train))(mpooled)
        # select each detection's own class mask on device: shipping the
        # full [B, D, 28, 28, C] stack to the host costs ~25 MB/frame at
        # C=81 (the dominant latency through a remote device link)
        cls = detections[..., 4].astype(jnp.int32)          # [B, D]
        # per-detection class-plane select as a dense one-hot contraction:
        # take_along_axis over the 81-wide trailing dim lowers to ~130 ns
        # scalar gathers per (detection, pixel) — the one-hot is fused
        oh = (cls[:, :, None] == jnp.arange(self.num_classes)[None, None, :])
        masks = jnp.einsum("bdhwc,bdc->bdhw", masks,
                           oh.astype(masks.dtype))
        # quantize for the host transfer (threshold happens at 0.5 anyway)
        masks = jnp.round(masks * 255.0).astype(jnp.uint8)
        return dict(detections=detections, detection_valid=det_valid,
                    masks=masks, proposals=proposals, rpn_probs=rpn_probs,
                    rpn_bbox=rpn_bbox)

    def train_forward(self, images, anchors, rng, gt_class_ids, gt_boxes,
                      gt_masks, train_rois: int = 200,
                      positive_ratio: float = 0.33,
                      train_bn: bool = False):
        """Full training-mode forward (= the training branch of
        ``MaskRCNN.build``, model.py:1957-2008): backbone -> RPN ->
        proposals -> detection-target sampling -> heads.

        Returns (outputs dict for losses, sampled targets dict).
        """
        from slam_maskrcnn_tpu.models.targets import detection_targets

        B = images.shape[0]
        pyramid = self.features(images, train_bn)
        mrcnn_feats = pyramid[:4]
        rpn_logits, rpn_probs, rpn_bbox = self.rpn_outputs(pyramid)
        proposals, _ = generate_proposals(
            rpn_probs, rpn_bbox, anchors, self.proposal_count,
            self.rpn_nms_threshold, self.pre_nms_limit, self.rpn_bbox_std)
        proposals = jax.lax.stop_gradient(proposals)

        rngs = jax.random.split(rng, B)
        sample = lambda k, p, ci, bx, mk: detection_targets(
            k, p, ci, bx, mk, train_rois=train_rois,
            positive_ratio=positive_ratio,
            mask_size=self.mask_pool_size * 2, bbox_std=self.bbox_std)
        rois, tgt_cls, tgt_bbox, tgt_mask, roi_valid = jax.vmap(sample)(
            rngs, proposals, gt_class_ids, gt_boxes, gt_masks)
        rois = jax.lax.stop_gradient(rois)

        # ROI align per image (vmap), heads on the FLATTENED [B*T] roi
        # batch — the reference's TimeDistributed heads see all rois of
        # the batch as one batch too (model.py:905-1008), and flattening
        # keeps the heads' live-BN batch-stats update OUT of the vmap
        # (a mutable collection under vmap is a tracer leak)
        def align(feats, r):
            pooled = pyramid_roi_align(feats, r, self.pool_size,
                                       self.image_shape)
            mpooled = pyramid_roi_align(feats, r, self.mask_pool_size,
                                        self.image_shape)
            return pooled, mpooled

        pooled, mpooled = jax.vmap(align)(mrcnn_feats, rois)
        T = pooled.shape[1]
        logits, probs, bbox = self.classifier(
            pooled.reshape((B * T,) + pooled.shape[2:]), train_bn)
        masks = self.mask_head(
            mpooled.reshape((B * T,) + mpooled.shape[2:]), train_bn)
        logits = logits.reshape((B, T) + logits.shape[1:])
        probs = probs.reshape((B, T) + probs.shape[1:])
        bbox = bbox.reshape((B, T) + bbox.shape[1:])
        masks = masks.reshape((B, T) + masks.shape[1:])
        outputs = dict(rpn_class_logits=rpn_logits, rpn_probs=rpn_probs,
                       rpn_bbox=rpn_bbox, mrcnn_class_logits=logits,
                       mrcnn_probs=probs, mrcnn_bbox=bbox, mrcnn_masks=masks)
        targets = dict(target_class_ids=tgt_cls, target_bbox=tgt_bbox,
                       target_mask=tgt_mask, roi_valid=roi_valid, rois=rois)
        return outputs, targets

    def training_heads(self, images, rois, train: bool = True):
        """Training-path heads on given (target-sampled) rois [B, T, 4]."""
        pyramid = self.features(images, train)
        mrcnn_feats = pyramid[:4]
        rpn_logits, rpn_probs, rpn_bbox = self.rpn_outputs(pyramid)

        def per_image(feats, r):
            pooled = pyramid_roi_align(feats, r, self.pool_size,
                                       self.image_shape)
            logits, probs, bbox = self.classifier(pooled, train)
            mpooled = pyramid_roi_align(feats, r, self.mask_pool_size,
                                        self.image_shape)
            masks = self.mask_head(mpooled, train)
            return logits, probs, bbox, masks

        logits, probs, bbox, masks = jax.vmap(per_image)(mrcnn_feats, rois)
        return dict(rpn_class_logits=rpn_logits, rpn_probs=rpn_probs,
                    rpn_bbox=rpn_bbox, mrcnn_class_logits=logits,
                    mrcnn_probs=probs, mrcnn_bbox=bbox, mrcnn_masks=masks)


# ---------------------------------------------------------------------------
# Host-side molding (reference utils.resize_image, model.py:2332-2369)
# ---------------------------------------------------------------------------

def resize_image(image, min_dim=None, max_dim=None, min_scale=None,
                 mode="square", rect_shape=None):
    """= ``utils.resize_image`` (utils.py:392-497), square/pad64 modes,
    plus the TPU-first "rect" mode (fit rect_shape preserving aspect,
    center-pad — see Config.IMAGE_RESIZE_MODE)."""
    import cv2

    h, w = image.shape[:2]
    window = (0, 0, h, w)
    scale = 1.0
    if mode == "none":
        return image, window, scale, [(0, 0), (0, 0), (0, 0)]
    if mode == "rect":
        mh, mw = rect_shape
        scale = min(mh / h, mw / w)
        if min_scale and scale < min_scale:
            scale = min_scale
        image = cv2.resize(image, (round(w * scale), round(h * scale)),
                           interpolation=cv2.INTER_LINEAR)
        h2, w2 = image.shape[:2]
        top_pad = (mh - h2) // 2
        bottom_pad = mh - h2 - top_pad
        left_pad = (mw - w2) // 2
        right_pad = mw - w2 - left_pad
        padding = [(top_pad, bottom_pad), (left_pad, right_pad), (0, 0)]
        image = np.pad(image, padding, mode="constant")
        window = (top_pad, left_pad, h2 + top_pad, w2 + left_pad)
        return image, window, scale, padding
    if min_dim:
        scale = max(1.0, min_dim / min(h, w))
    if min_scale and scale < min_scale:
        scale = min_scale
    if max_dim and mode == "square":
        image_max = max(h, w)
        if round(image_max * scale) > max_dim:
            scale = max_dim / image_max
    if scale != 1:
        image = cv2.resize(image, (round(w * scale), round(h * scale)),
                           interpolation=cv2.INTER_LINEAR)
    if mode == "square":
        h2, w2 = image.shape[:2]
        top_pad = (max_dim - h2) // 2
        bottom_pad = max_dim - h2 - top_pad
        left_pad = (max_dim - w2) // 2
        right_pad = max_dim - w2 - left_pad
        padding = [(top_pad, bottom_pad), (left_pad, right_pad), (0, 0)]
        image = np.pad(image, padding, mode="constant")
        window = (top_pad, left_pad, h2 + top_pad, w2 + left_pad)
    elif mode == "pad64":
        h2, w2 = image.shape[:2]
        bottom_pad = (64 - h2 % 64) % 64
        right_pad = (64 - w2 % 64) % 64
        padding = [(0, bottom_pad), (0, right_pad), (0, 0)]
        image = np.pad(image, padding, mode="constant")
        window = (0, 0, h2, w2)
    elif mode == "crop":
        # random min_dim crop (training only), utils.py:475-487
        h2, w2 = image.shape[:2]
        y = np.random.randint(0, (h2 - min_dim) + 1) if h2 > min_dim else 0
        x = np.random.randint(0, (w2 - min_dim) + 1) if w2 > min_dim else 0
        image = image[y:y + min_dim, x:x + min_dim]
        window = (0, 0, min_dim, min_dim)
        padding = [(0, 0), (0, 0), (0, 0)]
        return image, window, scale, padding, (y, x, min_dim, min_dim)
    else:
        raise ValueError(f"mode {mode} not supported")
    return image, window, scale, padding


def mold_image(image, config):
    """Subtract mean pixel (``model.py:2706-2713``)."""
    return image.astype(np.float32) - config.MEAN_PIXEL


def unmold_mask(mask28, bbox, image_shape):
    """Paste one 28x28 float mask into the full image
    (``utils.unmold_mask``, utils.py:565-581): resize to box, threshold 0.5."""
    import cv2

    y1, x1, y2, x2 = bbox
    if y2 <= y1 or x2 <= x1:
        return np.zeros(image_shape[:2], bool)
    m = cv2.resize(mask28.astype(np.float32), (x2 - x1, y2 - y1),
                   interpolation=cv2.INTER_LINEAR)
    # masks arrive quantized to [0, 255] uint8 from the device
    m = m >= (127.5 if mask28.dtype == np.uint8 else 0.5)
    full = np.zeros(image_shape[:2], bool)
    full[y1:y2, x1:x2] = m
    return full


class MaskRCNN:
    """User-facing wrapper, API-compatible with the reference
    (``model.py:1812-2672``)."""

    def __init__(self, mode: str, config: Config, model_dir: str = "./logs"):
        assert mode in ("training", "inference")
        self.mode = mode
        self.config = config
        self.model_dir = model_dir
        self.epoch = 0
        shape = tuple(int(s) for s in config.IMAGE_SHAPE[:2])
        self.module = MaskRCNNModule(
            num_classes=config.NUM_CLASSES,
            backbone=config.BACKBONE,
            image_shape=shape,
            pool_size=config.POOL_SIZE,
            mask_pool_size=config.MASK_POOL_SIZE,
            fc_size=config.FPN_CLASSIF_FC_LAYERS_SIZE,
            top_down=config.TOP_DOWN_PYRAMID_SIZE,
            anchors_per_location=len(config.RPN_ANCHOR_RATIOS),
            anchor_stride=config.RPN_ANCHOR_STRIDE,
            proposal_count=(config.POST_NMS_ROIS_TRAINING
                            if mode == "training"
                            else config.POST_NMS_ROIS_INFERENCE),
            rpn_nms_threshold=config.RPN_NMS_THRESHOLD,
            pre_nms_limit=config.PRE_NMS_LIMIT,
            detection_max_instances=config.DETECTION_MAX_INSTANCES,
            detection_min_confidence=config.DETECTION_MIN_CONFIDENCE or 0.0,
            detection_nms_threshold=config.DETECTION_NMS_THRESHOLD,
            rpn_bbox_std=tuple(config.RPN_BBOX_STD_DEV),
            bbox_std=tuple(config.BBOX_STD_DEV),
            dtype=jnp.bfloat16 if config.COMPUTE_DTYPE == "bfloat16"
            else jnp.float32,
        )
        self.params = None
        self._apply = None
        self._anchors_dev = None

    # -- parameters ---------------------------------------------------------

    def init_params(self, rng: jax.Array | int = 0):
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        shape = tuple(int(s) for s in self.config.IMAGE_SHAPE[:2])
        anchors = get_anchors(self.config, self.config.IMAGE_SHAPE)
        dummy = jnp.zeros((1,) + shape + (3,), jnp.float32)
        variables = self.module.init(rng, dummy, jnp.asarray(anchors),
                                     jnp.zeros((1, 4), jnp.float32))
        self.params = variables
        return variables

    def load_weights(self, filepath: str, by_name: bool = True,
                     exclude: list[str] | None = None,
                     strict: bool | None = None):
        """Load weights: .h5 (Keras, via the importer) or orbax/msgpack.

        strict: default True for full-model loads (no exclude) — every
        model parameter must be written and every file layer consumed, so
        a real checkpoint (mask_rcnn_coco.h5) can never half-load
        silently. Excluded/partial loads default to non-strict."""
        if filepath.endswith(".h5"):
            from slam_maskrcnn_tpu.models.import_h5 import load_h5_weights
            if self.params is None:
                self.init_params()
            if strict is None:
                strict = not exclude
            self.params = load_h5_weights(filepath, self.params,
                                          exclude=exclude, strict=strict)
        else:
            from slam_maskrcnn_tpu.train.checkpoint import restore_params
            self.params = restore_params(filepath)
        return self

    def train(self, train_dataset, val_dataset=None, learning_rate=None,
              epochs=1, layers="all", augment=False, **kw):
        """API-parity delegate to train.Trainer (reference
        model.train, model.py:2244-2330)."""
        from slam_maskrcnn_tpu.train import Trainer

        if not hasattr(self, "_trainer"):
            self._trainer = Trainer(self, self.config)
        return self._trainer.train(train_dataset, val_dataset,
                                   learning_rate, epochs, layers,
                                   augment, **kw)

    def find_last(self) -> str:
        """Newest checkpoint in model_dir (``model.py:2054-2077``)."""
        names = sorted(
            d for d in os.listdir(self.model_dir)
            if d.startswith(self.config.NAME.lower() if self.config.NAME else ""))
        for name in reversed(names):
            ckpts = sorted(
                f for f in os.listdir(os.path.join(self.model_dir, name))
                if re.match(r"mask_rcnn.*", f))
            if ckpts:
                return os.path.join(self.model_dir, name, ckpts[-1])
        raise FileNotFoundError(
            f"No checkpoints under {self.model_dir}")

    # -- inference ----------------------------------------------------------

    def mold_inputs(self, images):
        """= model.py:2332-2369. Returns (resized uint8 [B,H,W,3], windows);
        the mean-pixel subtraction happens on device (uint8 upload is 4x
        smaller over a remote device link)."""
        molded, windows = [], []
        for img in images:
            m, window, scale, _ = resize_image(
                img, self.config.IMAGE_MIN_DIM, self.config.IMAGE_MAX_DIM,
                self.config.IMAGE_MIN_SCALE, self.config.IMAGE_RESIZE_MODE,
                rect_shape=getattr(self.config, "IMAGE_RECT_SHAPE", None))
            molded.append(m.astype(np.uint8))
            windows.append(window)
        return np.stack(molded), np.stack(windows)

    def _apply_fn(self):
        if self._apply is None:
            mean = jnp.asarray(self.config.MEAN_PIXEL, jnp.float32)

            @jax.jit
            def run(params, images_u8, anchors, windows):
                images = images_u8.astype(jnp.float32) - mean
                return self.module.apply(params, images, anchors, windows)
            self._apply = run
        return self._apply

    def detect(self, images, verbose: int = 0):
        """Run detection on a list of raw RGB images (``model.py:2436-2492``).
        Returns list of dicts: rois [N,4] pixel (y1,x1,y2,x2), class_ids [N],
        scores [N], masks [H,W,N] bool."""
        assert self.params is not None, "init_params()/load_weights() first"
        molded, windows = self.mold_inputs(images)
        H, W = molded.shape[1:3]
        if self._anchors_dev is None:
            self._anchors_dev = jnp.asarray(
                get_anchors(self.config, molded.shape[1:]))
        # normalized windows
        scale = np.array([H - 1, W - 1, H - 1, W - 1], np.float32)
        shift = np.array([0, 0, 1, 1], np.float32)
        norm_windows = ((windows.astype(np.float32) - shift) / scale)
        out = self._apply_fn()(self.params, jnp.asarray(molded),
                               self._anchors_dev,
                               jnp.asarray(norm_windows))
        detections = np.asarray(out["detections"])
        masks = np.asarray(out["masks"])
        results = []
        for i, img in enumerate(images):
            results.append(self.unmold_detections(
                detections[i], masks[i], img.shape, molded.shape[1:],
                windows[i]))
        return results

    def unmold_detections(self, detections, mrcnn_mask, original_shape,
                          molded_shape, window):
        """= model.py:2371-2434."""
        zero_ix = np.where(detections[:, 4] == 0)[0]
        N = zero_ix[0] if zero_ix.shape[0] > 0 else detections.shape[0]

        boxes = detections[:N, :4]
        class_ids = detections[:N, 4].astype(np.int32)
        scores = detections[:N, 5]
        masks = mrcnn_mask[:N]  # class-selected on device

        # window in normalized coords of the molded image
        H, W = molded_shape[:2]
        scale = np.array([H - 1, W - 1, H - 1, W - 1], np.float32)
        shift = np.array([0, 0, 1, 1], np.float32)
        wy1, wx1, wy2, wx2 = (np.array(window, np.float32) - shift) / scale
        wh, ww = wy2 - wy1, wx2 - wx1
        boxes = (boxes - np.array([wy1, wx1, wy1, wx1])) / np.array(
            [wh, ww, wh, ww])
        # to original-image pixel coords
        oh, ow = original_shape[:2]
        oscale = np.array([oh - 1, ow - 1, oh - 1, ow - 1], np.float32)
        boxes = np.around(boxes * oscale + shift).astype(np.int32)

        # drop zero-area boxes (model.py:2409-2416)
        exclude = np.where((boxes[:, 2] <= boxes[:, 0])
                           | (boxes[:, 3] <= boxes[:, 1]))[0]
        if exclude.shape[0] > 0:
            boxes = np.delete(boxes, exclude, axis=0)
            class_ids = np.delete(class_ids, exclude, axis=0)
            scores = np.delete(scores, exclude, axis=0)
            masks = np.delete(masks, exclude, axis=0)
            N = boxes.shape[0]

        full_masks = [unmold_mask(masks[i], boxes[i], original_shape)
                      for i in range(N)]
        full_masks = (np.stack(full_masks, axis=-1) if full_masks
                      else np.empty(original_shape[:2] + (0,), bool))
        return dict(rois=boxes, class_ids=class_ids, scores=scores,
                    masks=full_masks)
