"""Layer primitives vs. PyTorch (CPU) golden outputs.

Pins the exact semantics (padding arithmetic, transpose-conv flip, BN stats)
needed for checkpoint conversion and reference parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from efgh_tpu.models.layers import BatchNorm, Conv, ConvTransposeTorch


def _init_and_override(module, x, overrides):
    vars_ = module.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda a: a, vars_)
    flat = dict(params["params"])
    flat.update(overrides)
    params = dict(vars_)
    params["params"] = flat
    return params


@pytest.mark.parametrize("stride,pad", [(1, 1), (2, 1), (1, 0), (2, 0)])
def test_conv_matches_torch(rng, stride, pad):
    cin, cout, k = 3, 5, 3
    x = rng.randn(2, 9, 11, cin).astype(np.float32)
    w = rng.randn(cout, cin, k, k).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)

    tconv = torch.nn.Conv2d(cin, cout, k, stride, pad)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    m = Conv(cout, (k, k), (stride, stride), (pad, pad))
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vars_ = {
        "params": {
            "Conv_0": {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
        }
    }
    out = np.asarray(m.apply(vars_, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.parametrize("stride,pad,outpad", [(2, 1, 1), (2, 1, 0), (2, 0, 0)])
def test_conv_transpose_matches_torch(rng, stride, pad, outpad):
    cin, cout, k = 4, 6, 3
    x = rng.randn(2, 7, 9, cin).astype(np.float32)
    w = rng.randn(cin, cout, k, k).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)

    tconv = torch.nn.ConvTranspose2d(cin, cout, k, stride, pad, outpad)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    m = ConvTransposeTorch(cout, (k, k), (stride, stride), (pad, pad),
                           (outpad, outpad))
    vars_ = {
        "params": {
            "kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),  # (kh,kw,Cin,Cout)
            "bias": jnp.asarray(b),
        }
    }
    out = np.asarray(m.apply(vars_, jnp.asarray(x))).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_batchnorm_matches_torch_train_mode(rng):
    c = 8
    x = rng.randn(4, 5, 6, c).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(c)
    tbn.train()
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    m = BatchNorm()
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    out, new_state = m.apply(vars_, jnp.asarray(x), train=True,
                             mutable=["batch_stats"])
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-4)

    # running stats update matches torch momentum 0.1 (unbiased var in torch)
    t_mean = tbn.running_mean.numpy()
    j_mean = np.asarray(
        jax.tree_util.tree_leaves(new_state["batch_stats"])[0]
    )
    np.testing.assert_allclose(np.sort(j_mean), np.sort(t_mean), atol=1e-3)
