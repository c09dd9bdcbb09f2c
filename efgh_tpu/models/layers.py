"""Layer primitives with PyTorch-parity semantics, NHWC layout.

Everything here mirrors the reference's layer factories
(reference nets/net_utils.py:35-98) so shapes and init distributions match,
but in TPU-friendly NHWC with explicit padding.  The transpose conv
reproduces torch's ConvTranspose2d output-size arithmetic exactly
(out = (in-1)*s - 2p + k + op), which flax's SAME/VALID presets do not.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LEAKY_RATE = 0.1  # reference nets/net_utils.py:3


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


# ---- initializers ----

def normal_init(std: float = 1e-3):
    """N(0, std) — the reference's init_weights (reference nets/net_utils.py:22-33)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


def kaiming_normal_fan_out():
    """He normal, fan_out, relu — VGG init (reference nets/vgg.py:55-60)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_default_kernel_init():
    """torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) == U with
    variance 1/(3*fan_in)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


# ---- modules ----

class Conv(nn.Module):
    """2-D conv, NHWC, torch padding semantics (int padding = symmetric)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    kernel_init: Callable = None  # type: ignore[assignment]
    dtype: Optional[jnp.dtype] = None
    groups: int = 1  # torch Conv2d groups (reference nets/resnet.py:22-25)

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        cin = x.shape[-1] // self.groups
        kinit = self.kernel_init or torch_default_kernel_init()
        fan_in = cin * k[0] * k[1]
        binit = torch_default_bias_init(fan_in)
        return nn.Conv(
            self.features,
            kernel_size=k,
            strides=s,
            padding=((p[0], p[0]), (p[1], p[1])),
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit if self.kernel_init is None else nn.initializers.zeros,
            dtype=self.dtype,
            feature_group_count=self.groups,
        )(x)


class ConvTransposeTorch(nn.Module):
    """ConvTranspose2d with torch semantics: out = (in-1)*s - 2p + k + op.

    Implemented as an input-dilated conv with a spatially-flipped kernel —
    this is the mathematical definition of transpose convolution and maps
    cleanly onto the MXU.  Kernel param is stored (kh, kw, C_in, C_out) for a
    direct correspondence with torch's (C_in, C_out, kh, kw).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (2, 2)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    kernel_init: Callable = None  # type: ignore[assignment]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        cin = x.shape[-1]
        kinit = self.kernel_init or torch_default_kernel_init()
        kernel = self.param("kernel", kinit, (k[0], k[1], cin, self.features))
        # flip spatially; dilate input by stride; pad (k-1-p) + op on the
        # trailing side
        w = jnp.flip(kernel, axis=(0, 1))
        pad = tuple(
            (k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(2)
        )
        dtype = self.dtype or x.dtype
        out = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=s,
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = cin * k[0] * k[1]
            binit = (torch_default_bias_init(fan_in)
                     if self.kernel_init is None else nn.initializers.zeros)
            bias = self.param("bias", binit, (self.features,))
            out = out + bias.astype(dtype)
        return out


class BatchNorm(nn.Module):
    """BatchNorm with torch defaults (eps 1e-5, momentum 0.1)."""

    use_running_average: bool = False

    @nn.compact
    def __call__(self, x, train: Optional[bool] = None):
        use_ra = not train if train is not None else self.use_running_average
        return nn.BatchNorm(
            use_running_average=use_ra,
            momentum=0.9,
            epsilon=1e-5,
        )(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (B, P, C) whose batch statistics cover only positions
    with mask True.

    The reference normalizes over the *actual* (data-dependent) lattice cell
    count (BatchNorm1d over (B, C, hash_cnt), reference nets/enet.py:89-91);
    with static capacity padding the plain BN would fold phantom slots into
    the statistics.  Running stats update with the biased masked variance
    (flax convention; torch's running_var is unbiased — sub-0.1% at these
    population sizes).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                mean = jnp.mean(xf, axis=(0, 1))
                var = jnp.var(xf, axis=(0, 1))
            else:
                m = mask.astype(jnp.float32)[..., None]
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=(0, 1)) / cnt
                var = jnp.sum(((xf - mean) ** 2) * m, axis=(0, 1)) / cnt
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


def leaky_relu(x, negative_slope=LEAKY_RATE):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class ConvBNRelu(nn.Module):
    """conv_bn_relu: Conv2d(+BN)(+LeakyReLU 0.2), N(0,1e-3) init
    (reference nets/net_utils.py:45-64)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    bn: bool = True
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(
            self.features, self.kernel_size, self.stride, self.padding,
            use_bias=not self.bn, kernel_init=normal_init(1e-3),
        )(x)
        if self.bn:
            x = BatchNorm()(x, train=train)
        if self.relu:
            x = leaky_relu(x, 0.2)
        return x


class ConvTBNRelu(nn.Module):
    """convt_bn_relu: ConvTranspose(+BN+LReLU 0.2) followed by an extra
    Conv3x3(+BN+LReLU 0.2) (reference nets/net_utils.py:66-98)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (2, 2)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (0, 0)
    bn: bool = True
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvTransposeTorch(
            self.features, self.kernel_size, self.stride, self.padding,
            self.output_padding, use_bias=not self.bn,
            kernel_init=normal_init(1e-3),
        )(x)
        if self.bn:
            x = BatchNorm()(x, train=train)
        if self.relu:
            x = leaky_relu(x, 0.2)
        x = Conv(self.features, (3, 3), (1, 1), (1, 1), use_bias=not self.bn,
                 kernel_init=normal_init(1e-3))(x)
        if self.bn:
            x = BatchNorm()(x, train=train)
        if self.relu:
            x = leaky_relu(x, 0.2)
        return x


class PointwiseConvRelu(nn.Module):
    """conv_1x1: Conv1d k1 + (Leaky)ReLU on (B, N, C) point features,
    N(0,1e-3) init (reference nets/net_utils.py:35-43)."""

    features: int
    use_leaky: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, kernel_init=normal_init(1e-3),
                     bias_init=nn.initializers.zeros)(x)
        return leaky_relu(x, LEAKY_RATE) if self.use_leaky else nn.relu(x)


class DenseTorch(nn.Module):
    """Linear with torch default init."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_default_kernel_init(),
            bias_init=torch_default_bias_init(fan_in),
        )(x)


def concat_crop(t1, t2):
    """Concat along channels, center-cropping t2's H to t1's (NHWC version of
    reference common/torch_utils.py:309-319)."""
    if t2.shape[1] != t1.shape[1]:
        p1 = (t2.shape[1] - t1.shape[1]) // 2
        t2 = t2[:, p1:p1 + t1.shape[1], :, :]
    return jnp.concatenate([t1, t2], axis=-1)


def max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def maybe_remat(module_cls, enable: bool):
    """Optionally wrap a tower module with activation rematerialization.

    `nn.remat` (jax.checkpoint) recomputes the tower's internals during the
    backward pass instead of keeping every conv/BN activation resident —
    the HBM fix for batch>=2 training at production shapes
    (docs/PERFORMANCE.md).  Param paths are unchanged (lifted transform),
    so checkpoints/converters are unaffected.  `train` (arg 2) is static.
    """
    if not enable:
        return module_cls
    return nn.remat(module_cls, static_argnums=(2,))
