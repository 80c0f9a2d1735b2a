"""ResNet-50/101 + FPN backbone (Flax linen).

Architecture parity with the reference ``resnet_graph`` / FPN assembly
(``Mask_RCNN/mrcnn/model.py:101-212, 1894-1911``): ZeroPad(3)+7x7/2 valid
stem, bottleneck stages [3, 4, {6|23}, 3], FPN lateral 1x1 + top-down
upsample-add + 3x3 smoothing, P6 = stride-2 subsample of P5.

Module/param names mirror the Keras layer names (res2a_branch2a, bn_conv1,
fpn_c5p5, ...) so the ``mask_rcnn_coco.h5`` importer maps weights 1:1.

TPU notes: convs run in ``dtype`` (bfloat16 by default — 2x MXU throughput)
with float32 params and BN statistics; nearest-neighbor upsampling is a
reshape-broadcast, which XLA fuses into the add.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNorm(nn.Module):
    """Keras-compatible BatchNorm (epsilon 1e-3, channels-last), frozen by
    default as the reference's small-batch setting (config.py:173)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                            momentum=0.99, dtype=self.dtype,
                            param_dtype=jnp.float32, name="bn")(x)


def _conv(features, kernel, name, strides=1, padding="SAME", dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding=padding, use_bias=True, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class Bottleneck(nn.Module):
    """identity_block / conv_block (model.py:101-177)."""

    filters: tuple[int, int, int]
    stage: int
    block: str
    strides: int = 1
    conv_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1, f2, f3 = self.filters
        cname = f"res{self.stage}{self.block}_branch"
        bname = f"bn{self.stage}{self.block}_branch"
        y = _conv(f1, 1, cname + "2a", strides=self.strides, dtype=self.dtype)(x)
        y = BatchNorm(self.dtype, name=bname + "2a")(y, train)
        y = nn.relu(y)
        y = _conv(f2, 3, cname + "2b", dtype=self.dtype)(y)
        y = BatchNorm(self.dtype, name=bname + "2b")(y, train)
        y = nn.relu(y)
        y = _conv(f3, 1, cname + "2c", dtype=self.dtype)(y)
        y = BatchNorm(self.dtype, name=bname + "2c")(y, train)
        if self.conv_shortcut:
            sc = _conv(f3, 1, cname + "1", strides=self.strides,
                       dtype=self.dtype)(x)
            sc = BatchNorm(self.dtype, name=bname + "1")(sc, train)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNet(nn.Module):
    """resnet_graph (model.py:177-212). Returns (C2, C3, C4, C5)."""

    architecture: str = "resnet101"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.architecture in ("resnet50", "resnet101")
        x = x.astype(self.dtype)
        # Stage 1: ZeroPadding2D((3,3)) + 7x7/2 valid + BN + relu + maxpool
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID",
                    use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = BatchNorm(self.dtype, name="bn_conv1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        # Stage 2
        x = Bottleneck((64, 64, 256), 2, "a", 1, True, self.dtype)(x, train)
        x = Bottleneck((64, 64, 256), 2, "b", dtype=self.dtype)(x, train)
        c2 = x = Bottleneck((64, 64, 256), 2, "c", dtype=self.dtype)(x, train)
        # Stage 3
        x = Bottleneck((128, 128, 512), 3, "a", 2, True, self.dtype)(x, train)
        for b in "bcd":
            x = Bottleneck((128, 128, 512), 3, b, dtype=self.dtype)(x, train)
        c3 = x
        # Stage 4
        x = Bottleneck((256, 256, 1024), 4, "a", 2, True, self.dtype)(x, train)
        n = {"resnet50": 5, "resnet101": 22}[self.architecture]
        for i in range(n):
            x = Bottleneck((256, 256, 1024), 4, chr(98 + i),
                           dtype=self.dtype)(x, train)
        c4 = x
        # Stage 5
        x = Bottleneck((512, 512, 2048), 5, "a", 2, True, self.dtype)(x, train)
        x = Bottleneck((512, 512, 2048), 5, "b", dtype=self.dtype)(x, train)
        c5 = Bottleneck((512, 512, 2048), 5, "c", dtype=self.dtype)(x, train)
        return c2, c3, c4, c5


def _upsample2x(x):
    """Nearest-neighbor 2x (Keras UpSampling2D default interpolation)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class FPN(nn.Module):
    """Top-down pyramid (model.py:1894-1911). Returns (P2, P3, P4, P5, P6)."""

    size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        p5 = _conv(self.size, 1, "fpn_c5p5", dtype=self.dtype)(c5)
        p4 = _upsample2x(p5) + _conv(self.size, 1, "fpn_c4p4",
                                     dtype=self.dtype)(c4)
        p3 = _upsample2x(p4) + _conv(self.size, 1, "fpn_c3p3",
                                     dtype=self.dtype)(c3)
        p2 = _upsample2x(p3) + _conv(self.size, 1, "fpn_c2p2",
                                     dtype=self.dtype)(c2)
        p2 = _conv(self.size, 3, "fpn_p2", dtype=self.dtype)(p2)
        p3 = _conv(self.size, 3, "fpn_p3", dtype=self.dtype)(p3)
        p4 = _conv(self.size, 3, "fpn_p4", dtype=self.dtype)(p4)
        p5 = _conv(self.size, 3, "fpn_p5", dtype=self.dtype)(p5)
        # P6: MaxPooling2D(pool_size=1, strides=2) == stride-2 subsample
        p6 = p5[:, ::2, ::2, :]
        return p2, p3, p4, p5, p6
