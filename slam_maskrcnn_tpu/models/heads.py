"""FPN classifier + mask heads (Flax linen).

= ``fpn_classifier_graph`` / ``build_fpn_mask_graph``
(``Mask_RCNN/mrcnn/model.py:905-1008``). The reference wraps per-ROI convs
in Keras TimeDistributed; here ROIs fold into the batch axis (fixed count)
so everything is one big batched conv — the natural MXU shape.

Param names mirror the Keras layers (mrcnn_class_conv1, mrcnn_mask_bn3, ...)
for the h5 importer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from slam_maskrcnn_tpu.models.backbone import BatchNorm
from slam_maskrcnn_tpu.ops.roi_align import pyramid_roi_align


class FPNClassifier(nn.Module):
    """Classifier + box-regressor head.

    Call with pooled ROI features [R, pool, pool, C]; returns
    (class_logits [R, num_classes] f32, probs, bbox deltas
    [R, num_classes, 4] f32).
    """

    num_classes: int
    pool_size: int = 7
    fc_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        R = x.shape[0]
        x = x.astype(self.dtype)
        # FC-as-conv: pool_size x pool_size VALID conv -> [R,1,1,1024]
        x = nn.Conv(self.fc_size, (self.pool_size, self.pool_size),
                    padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="mrcnn_class_conv1")(x)
        x = BatchNorm(self.dtype, name="mrcnn_class_bn1")(x, train)
        x = nn.relu(x)
        x = nn.Conv(self.fc_size, (1, 1), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="mrcnn_class_conv2")(x)
        x = BatchNorm(self.dtype, name="mrcnn_class_bn2")(x, train)
        x = nn.relu(x)
        shared = x.reshape(R, self.fc_size)

        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32,
                          name="mrcnn_class_logits")(shared)
        logits = logits.astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1)
        bbox = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                        param_dtype=jnp.float32, name="mrcnn_bbox_fc")(shared)
        bbox = bbox.reshape(R, self.num_classes, 4).astype(jnp.float32)
        return logits, probs, bbox


class MaskHead(nn.Module):
    """Per-ROI mask head: 4x conv256+BN+relu, 2x2/2 deconv, 1x1 sigmoid.

    Call with pooled ROI features [R, pool, pool, C]; returns masks
    [R, 2*pool, 2*pool, num_classes] f32 in [0, 1].
    """

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for i in range(1, 5):
            x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"mrcnn_mask_conv{i}")(x)
            x = BatchNorm(self.dtype, name=f"mrcnn_mask_bn{i}")(x, train)
            x = nn.relu(x)
        x = nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="mrcnn_mask_deconv")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="mrcnn_mask")(x)
        return nn.sigmoid(x.astype(jnp.float32))
