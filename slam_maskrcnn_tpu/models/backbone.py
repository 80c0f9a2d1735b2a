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


class S2DStemConv(nn.Module):
    """The 7x7/2 stem conv evaluated as a space-to-depth 4x4/1 conv.

    Parameters are IDENTICAL to the reference's ``conv1`` Conv2D
    (kernel [7, 7, 3, 64] + bias, model.py:187) — only the evaluation
    order changes: a 3-channel 7x7 conv cannot tile the v5e MXU (it
    measured 5.4 ms of the backbone's 8.0 ms at 1024^2) while the exact
    reindexing below — pad the kernel to 8x8 on the leading edges,
    split both spatial dims into (outer, parity), fold the parity pair
    into 12 input channels — runs the same multiply-adds as a dense
    4x4 stride-1 conv. Standard TPU practice for conv stems.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, 64), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (64,), jnp.float32)
        B, H, W, _ = x.shape
        assert H % 2 == 0 and W % 2 == 0, "s2d stem needs even extents"
        # reference geometry: ZeroPadding2D((3,3)) + VALID 7x7 stride 2.
        # Pad one extra leading row/col; those taps meet the zero row of
        # the 8x8-padded kernel, so y[i,j] = sum_{a,b} w[a,b] *
        # xpad3[2i+a, 2j+b] exactly.
        xq = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        Hq, Wq = H + 8, W + 8
        xs = xq.reshape(B, Hq // 2, 2, Wq // 2, 2, 3)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hq // 2, Wq // 2, 12)
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        k4 = k4.reshape(4, 4, 12, 64)
        y = jax.lax.conv_general_dilated(
            xs.astype(self.dtype), k4.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # the s2d form yields one extra trailing output row/col (taps the
        # reference's geometry never reads) — drop it
        return y[:, :H // 2, :W // 2, :] + b.astype(self.dtype)


class ResNet(nn.Module):
    """resnet_graph (model.py:177-212). Returns (C2, C3, C4, C5)."""

    architecture: str = "resnet101"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.architecture in ("resnet50", "resnet101")
        x = x.astype(self.dtype)
        # Stage 1: ZeroPadding2D((3,3)) + 7x7/2 valid + BN + relu + maxpool
        # (the 7x7 runs in space-to-depth form; same conv1 parameters)
        x = S2DStemConv(self.dtype, name="conv1")(x)
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
