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
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "C": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"],
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


def vgg11_bn() -> VGGFeatures:
    return VGGFeatures(cfg="A", batch_norm=True)


def vgg11_bn_modified() -> VGGFeatures:
    return VGGFeatures(cfg="C", batch_norm=True)
