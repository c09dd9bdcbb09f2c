"""VGG feature trunks (classifier-free), NHWC.

Mirrors the reference's torchvision-derived VGG with the classifier stripped
(reference nets/vgg.py:25-94): config 'A' (vgg11_bn, 5 maxpools — used by H)
and config 'C' (vgg11_bn_modified, 4 maxpools — used by F's twin towers).
Pretrained weights are never loaded in the reference (reference
nets/vgg.py:101-104); init is He-normal fan_out like torch's kaiming init.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from efgh_tpu.models.layers import BatchNorm, Conv, kaiming_normal_fan_out, max_pool_2x2

CFGS = {
    # reference nets/vgg.py:86-94
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
          512, 512, "M"],
    "C": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
    "F": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M"],
}


class VGGFeatures(nn.Module):
    """VGG feature extractor.

    Attributes:
      cfg: "A" (5 pools, /32) or "C" (4 pools, /16).
      batch_norm: insert BN after every conv (reference always uses _bn).
    """

    cfg: str = "A"
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        for v in CFGS[self.cfg]:
            if v == "M":
                x = max_pool_2x2(x)
            else:
                x = Conv(int(v), (3, 3), (1, 1), (1, 1), use_bias=True,
                         kernel_init=kaiming_normal_fan_out())(x)
                if self.batch_norm:
                    x = BatchNorm()(x, train=train)
                x = nn.relu(x)
        return x


def vgg11(bn=False):
    return VGGFeatures(cfg="A", batch_norm=bn)


def vgg11_bn() -> VGGFeatures:
    return VGGFeatures(cfg="A", batch_norm=True)


def vgg11_bn_modified() -> VGGFeatures:
    """4-pool variant used by F's twin towers (reference nets/vgg.py:127-134)."""
    return VGGFeatures(cfg="C", batch_norm=True)


def vgg13(bn=False):
    return VGGFeatures(cfg="B", batch_norm=bn)


def vgg13_bn():
    return VGGFeatures(cfg="B", batch_norm=True)


def vgg16(bn=False):
    return VGGFeatures(cfg="D", batch_norm=bn)


def vgg16_bn():
    return VGGFeatures(cfg="D", batch_norm=True)


def vgg16_bn_modified():
    """4-pool VGG16 variant (reference nets/vgg.py:196-203)."""
    return VGGFeatures(cfg="F", batch_norm=True)


def vgg19(bn=False):
    return VGGFeatures(cfg="E", batch_norm=bn)


def vgg19_bn():
    return VGGFeatures(cfg="E", batch_norm=True)
