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
    deeper variants in the zoo (reference nets/resnet.py)."""

    features: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out_ch = self.features * self.expansion
        out = Conv(self.features, (1, 1), (1, 1), (0, 0), use_bias=False,
                   kernel_init=normal_init(1e-3))(x)
        out = BatchNorm()(out, train=train)
        out = nn.relu(out)
        out = Conv(self.features, (3, 3), (self.stride, self.stride), (1, 1),
                   use_bias=False, kernel_init=normal_init(1e-3))(out)
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

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.block == "basic":
            out_ch = self.features
            blk = BasicBlock
        else:
            out_ch = self.features * 4
            blk = Bottleneck
        need_proj = self.stride != 1 or x.shape[-1] != out_ch
        x = blk(self.features, self.stride, downsample=need_proj)(x, train)
        for _ in range(self.blocks - 1):
            x = blk(self.features, 1, downsample=False)(x, train)
        return x


# layer plans of the torchvision zoo the reference vendors
# (reference nets/resnet.py): name -> (block, [blocks per layer])
RESNET_PLANS = {
    "resnet18": ("basic", [2, 2, 2, 2]),
    "resnet34": ("basic", [3, 4, 6, 3]),
    "resnet50": ("bottleneck", [3, 4, 6, 3]),
    "resnet101": ("bottleneck", [3, 4, 23, 3]),
    "resnet152": ("bottleneck", [3, 8, 36, 3]),
}


class ResNetTrunk(nn.Module):
    """layer1..layer4 of a torchvision-style resnet applied back to back."""

    arch: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = True):
        block, blocks = RESNET_PLANS[self.arch]
        for i, (feats, stride) in enumerate(
            zip([64, 128, 256, 512], [1, 2, 2, 2])
        ):
            x = ResNetStage(feats, stride, blocks=blocks[i], block=block,
                            name=f"layer{i + 1}")(x, train)
        return x


class ResNetEncoder(nn.Module):
    """layer1..layer4 with intermediate taps (for the G image U-Net)."""

    arch: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = True):
        block, blocks = RESNET_PLANS[self.arch]
        taps = []
        for i, (feats, stride) in enumerate(
            zip([64, 128, 256, 512], [1, 2, 2, 2])
        ):
            x = ResNetStage(feats, stride, blocks=blocks[i], block=block,
                            name=f"layer{i + 1}")(x, train)
            taps.append(x)
        return tuple(taps)


class ResNet18Trunk(ResNetTrunk):
    arch: str = "resnet18"


class ResNet18Encoder(ResNetEncoder):
    arch: str = "resnet18"
