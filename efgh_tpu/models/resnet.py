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


class Bottleneck(nn.Module):
    """Bottleneck residual block (1x1 -> 3x3 -> 1x1, expansion 4) for the
    deeper variants in the zoo (reference nets/resnet.py:83-130).

    `groups`/`base_width` give the ResNeXt / wide variants: the inner width
    is int(features * base_width / 64) * groups and the 3x3 conv is grouped
    (torchvision semantics, reference nets/resnet.py:95-99)."""

    features: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        out_ch = self.features * self.expansion
        out = Conv(width, (1, 1), (1, 1), (0, 0), use_bias=False,
                   kernel_init=normal_init(1e-3))(x)
        out = BatchNorm()(out, train=train)
        out = nn.relu(out)
        out = Conv(width, (3, 3), (self.stride, self.stride), (1, 1),
                   use_bias=False, kernel_init=normal_init(1e-3),
                   groups=self.groups)(out)
        out = BatchNorm()(out, train=train)
        out = nn.relu(out)
        out = Conv(out_ch, (1, 1), (1, 1), (0, 0), use_bias=False,
                   kernel_init=normal_init(1e-3))(out)
        out = BatchNorm()(out, train=train)
        if self.downsample:
            identity = Conv(out_ch, (1, 1), (self.stride, self.stride),
                            (0, 0), use_bias=False,
                            kernel_init=normal_init(1e-3))(x)
            identity = BatchNorm()(identity, train=train)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    """One resnet `layerN`: `blocks` residual blocks of the given type."""

    features: int
    stride: int = 1
    blocks: int = 2
    block: str = "basic"  # "basic" | "bottleneck"
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.block == "basic":
            out_ch = self.features
            blk = BasicBlock
            kw = {}
        else:
            out_ch = self.features * 4
            blk = Bottleneck
            kw = {"groups": self.groups, "base_width": self.base_width}
        need_proj = self.stride != 1 or x.shape[-1] != out_ch
        x = blk(self.features, self.stride, downsample=need_proj, **kw)(
            x, train)
        for _ in range(self.blocks - 1):
            x = blk(self.features, 1, downsample=False, **kw)(x, train)
        return x


# layer plans of the torchvision zoo the reference vendors
# (reference nets/resnet.py:234-335):
# name -> (block, [blocks per layer], groups, width_per_group)
RESNET_PLANS = {
    "resnet18": ("basic", [2, 2, 2, 2], 1, 64),
    "resnet34": ("basic", [3, 4, 6, 3], 1, 64),
    "resnet50": ("bottleneck", [3, 4, 6, 3], 1, 64),
    "resnet101": ("bottleneck", [3, 4, 23, 3], 1, 64),
    "resnet152": ("bottleneck", [3, 8, 36, 3], 1, 64),
    "resnext50_32x4d": ("bottleneck", [3, 4, 6, 3], 32, 4),
    "resnext101_32x8d": ("bottleneck", [3, 4, 23, 3], 32, 8),
    "wide_resnet50_2": ("bottleneck", [3, 4, 6, 3], 1, 128),
    "wide_resnet101_2": ("bottleneck", [3, 4, 23, 3], 1, 128),
}


class ResNetTrunk(nn.Module):
    """layer1..layer4 of a torchvision-style resnet applied back to back."""

    arch: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = True):
        block, blocks, groups, base_width = RESNET_PLANS[self.arch]
        for i, (feats, stride) in enumerate(
            zip([64, 128, 256, 512], [1, 2, 2, 2])
        ):
            x = ResNetStage(feats, stride, blocks=blocks[i], block=block,
                            groups=groups, base_width=base_width,
                            name=f"layer{i + 1}")(x, train)
        return x


class ResNetEncoder(nn.Module):
    """layer1..layer4 with intermediate taps (for the G image U-Net)."""

    arch: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = True):
        block, blocks, groups, base_width = RESNET_PLANS[self.arch]
        taps = []
        for i, (feats, stride) in enumerate(
            zip([64, 128, 256, 512], [1, 2, 2, 2])
        ):
            x = ResNetStage(feats, stride, blocks=blocks[i], block=block,
                            groups=groups, base_width=base_width,
                            name=f"layer{i + 1}")(x, train)
            taps.append(x)
        return tuple(taps)


class ResNet18Trunk(ResNetTrunk):
    arch: str = "resnet18"


class ResNet18Encoder(ResNetEncoder):
    arch: str = "resnet18"
