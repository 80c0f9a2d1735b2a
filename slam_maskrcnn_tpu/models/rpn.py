"""Region Proposal Network head (Flax linen).

= ``rpn_graph`` / ``build_rpn_model`` (``Mask_RCNN/mrcnn/model.py:835-901``):
one head with shared weights applied to every pyramid level — in Flax the
module is simply called once per level inside the model (parameter sharing
by construction, no Keras Model-wrapping trick needed).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class RPNHead(nn.Module):
    """Per-level RPN. Returns (class_logits [B,N,2], probs [B,N,2],
    bbox deltas [B,N,4]) with N = H*W*anchors_per_location."""

    anchors_per_location: int = 3
    anchor_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        shared = nn.Conv(512, (3, 3), strides=(self.anchor_stride,) * 2,
                         padding="SAME", dtype=self.dtype,
                         param_dtype=jnp.float32,
                         name="rpn_conv_shared")(x)
        shared = nn.relu(shared)
        cls = nn.Conv(2 * self.anchors_per_location, (1, 1), padding="VALID",
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="rpn_class_raw")(shared)
        logits = cls.reshape(B, -1, 2).astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1)
        bbox = nn.Conv(4 * self.anchors_per_location, (1, 1), padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="rpn_bbox_pred")(shared)
        bbox = bbox.reshape(B, -1, 4).astype(jnp.float32)
        return logits, probs, bbox
