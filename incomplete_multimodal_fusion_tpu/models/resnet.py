"""ResNet backbone (reference downstream/*/modeling/backbone/resnet.py:1-201,
resnet_spec 18/34/50/101/152), NHWC flax implementation producing the
res2..res5 pyramid consumed by the CNN-variant MaskFormerModel
(MaskFormerModel.py:80-105).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen (identity) statistics: learned scale/bias only,
    params-only (no flax collections) — detectron2-style FrozenBN, the
    standard for detection backbones."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


# 3x3 convs use explicit (1,1) padding, NOT "SAME": torch Conv2d(k=3, p=1)
# pads both sides regardless of stride, while lax SAME at stride 2 pads
# (0,1) — spatially shifted features (caught by tests/test_resnet_parity.py)
class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv2")(y)
        y = FrozenBatchNorm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            residual = FrozenBatchNorm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = FrozenBatchNorm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            residual = FrozenBatchNorm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


RESNET_SPEC = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """Returns [res2, res3, res4, res5] NHWC features at strides 4/8/16/32."""

    depth: int = 50
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers = RESNET_SPEC[self.depth]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for stage, (n_blocks, feat) in enumerate(zip(layers, (64, 128, 256, 512))):
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                y = block(features=feat, strides=strides,
                          name=f"layer{stage + 1}_{b}")(y, train=train)
            feats.append(y)
        return feats
