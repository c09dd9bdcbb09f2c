"""ResNet-18 basic-block stages, NHWC.

The reference only consumes `layer1..layer4` of a torchvision resnet18, with
all weights re-initialized to N(0, 1e-3) (reference nets/gnet.py:31-37,82-88,
nets/resnet.py).  We therefore implement exactly those stages: four
sequences of two BasicBlocks each, channel plan 64-128-256-512, stride-2
downsampling at the head of layers 2-4 via a 1x1 projection shortcut.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from efgh_tpu.models.layers import BatchNorm, Conv, normal_init


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = Conv(self.features, (3, 3), (self.stride, self.stride), (1, 1),
                   use_bias=False, kernel_init=normal_init(1e-3))(x)
        out = BatchNorm()(out, train=train)
        out = nn.relu(out)
        out = Conv(self.features, (3, 3), (1, 1), (1, 1), use_bias=False,
                   kernel_init=normal_init(1e-3))(out)
        out = BatchNorm()(out, train=train)
        if self.downsample:
            identity = Conv(self.features, (1, 1), (self.stride, self.stride),
                            (0, 0), use_bias=False,
                            kernel_init=normal_init(1e-3))(x)
            identity = BatchNorm()(identity, train=train)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    """One resnet `layerN`: two BasicBlocks."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        need_proj = self.stride != 1 or x.shape[-1] != self.features
        x = BasicBlock(self.features, self.stride, downsample=need_proj)(x, train)
        x = BasicBlock(self.features, 1, downsample=False)(x, train)
        return x


class ResNet18Trunk(nn.Module):
    """layer1..layer4 of resnet18 applied back to back (64 -> 512, /8)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ResNetStage(64, 1, name="layer1")(x, train)
        x = ResNetStage(128, 2, name="layer2")(x, train)
        x = ResNetStage(256, 2, name="layer3")(x, train)
        x = ResNetStage(512, 2, name="layer4")(x, train)
        return x


class ResNet18Encoder(nn.Module):
    """layer1..layer4 with intermediate taps (for the G image U-Net)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        c2 = ResNetStage(64, 1, name="layer1")(x, train)
        c3 = ResNetStage(128, 2, name="layer2")(c2, train)
        c4 = ResNetStage(256, 2, name="layer3")(c3, train)
        c5 = ResNetStage(512, 2, name="layer4")(c4, train)
        return c2, c3, c4, c5
