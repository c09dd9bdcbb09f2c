"""ResNet zoo completeness: every plan in the reference's vendored zoo
(reference nets/resnet.py:234-335) builds, runs, and carries exactly the
reference's per-layer parameter counts (layer1..layer4 — the only stages the
reference consumes, reference nets/gnet.py:31-37)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efgh_tpu.models.resnet import RESNET_PLANS, ResNetTrunk

from reference_harness import install_reference


def _flax_param_count(arch: str) -> int:
    model = ResNetTrunk(arch=arch)
    x = jnp.zeros((1, 8, 8, 64), jnp.float32)
    shapes = jax.eval_shape(lambda r, x: model.init(r, x, train=False),
                            jax.random.PRNGKey(0), x)
    return sum(int(np.prod(v.shape))
               for v in jax.tree_util.tree_leaves(shapes["params"]))


def _torch_param_count(arch: str) -> int:
    install_reference()
    from nets import resnet as ref_resnet  # /root/reference on sys.path

    net = getattr(ref_resnet, arch)(pretrained=False)
    return sum(p.numel() for name in ("layer1", "layer2", "layer3", "layer4")
               for p in getattr(net, name).parameters())


@pytest.mark.parametrize("arch", sorted(RESNET_PLANS))
def test_param_count_matches_reference(arch):
    assert _flax_param_count(arch) == _torch_param_count(arch)


@pytest.mark.parametrize("arch", ["resnext50_32x4d", "wide_resnet50_2"])
def test_variant_forward_shapes(arch):
    model = ResNetTrunk(arch=arch)
    x = jnp.zeros((1, 16, 32, 64), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False)
    )(jax.random.PRNGKey(0), x)
    y = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )(variables, x)
    # stride-2 at layers 2-4 -> /8 spatially; bottleneck expansion 4 -> 2048
    assert y.shape == (1, 2, 4, 2048)
    assert np.all(np.isfinite(np.asarray(y)))


def test_grouped_conv_is_grouped():
    """resnext conv2 kernels must have C_in/groups input channels — a grouped
    conv, not a dense one wearing the name."""
    model = ResNetTrunk(arch="resnext50_32x4d")
    x = jnp.zeros((1, 8, 8, 64), jnp.float32)
    shapes = jax.eval_shape(lambda r, x: model.init(r, x, train=False),
                            jax.random.PRNGKey(0), x)
    # layer1 block0: width = int(64 * 4/64) * 32 = 128; conv2 grouped by 32
    blk = shapes["params"]["layer1"]["Bottleneck_0"]
    conv2 = blk["Conv_1"]["Conv_0"]["kernel"]
    assert conv2.shape == (3, 3, 128 // 32, 128)
