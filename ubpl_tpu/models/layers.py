"""flax.linen layer library for the hourglass family (NHWC, TPU-friendly).

Re-designs reference models/base/layers.py (Conv :31-50, Residual :53-84,
recursive Hourglass :87-111, Merge :123-130) as functional flax modules.
Initialization matches torch defaults (kaiming-uniform a=sqrt(5) == uniform
(+-1/sqrt(fan_in)) for conv kernels and biases) so training dynamics track
the reference.

BatchNorm: torch momentum 0.1 -> flax momentum 0.9, eps 1e-5.  Under data
parallelism batches are sharded with GSPMD, so BN statistics are computed
over the global logical batch by construction — no axis_name/sync knob is
needed (or present).
"""
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn
from flax.linen.initializers import variance_scaling

# torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))
torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype, fan_in):
    bound = 1.0 / jnp.sqrt(fan_in)
    import jax
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ConvBlock(nn.Module):
    """Reference Conv: conv(+bias) -> optional BN -> optional ReLU."""
    out_dim: int
    kernel_size: int = 3
    stride: int = 1
    bn: bool = False
    relu: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        fan_in = self.kernel_size * self.kernel_size * x.shape[-1]
        x = nn.Conv(self.out_dim, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[((self.kernel_size - 1) // 2,) * 2] * 2,
                    use_bias=True,
                    kernel_init=torch_kernel_init,
                    bias_init=lambda k, s, d=jnp.float32: torch_bias_init(
                        k, s, d, fan_in),
                    dtype=self.dtype)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ResidualBlock(nn.Module):
    """Reference Residual: pre-activation BN-ReLU 1-3-1 bottleneck + skip."""
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        inp_dim = x.shape[-1]
        mid = self.out_dim // 2

        def bn(y):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype)(y)

        residual = x
        if inp_dim != self.out_dim:
            residual = ConvBlock(self.out_dim, 1, relu=False,
                                 dtype=self.dtype)(x, train)
        out = nn.relu(bn(x))
        out = ConvBlock(mid, 1, relu=False, dtype=self.dtype)(out, train)
        out = nn.relu(bn(out))
        out = ConvBlock(mid, 3, relu=False, dtype=self.dtype)(out, train)
        out = nn.relu(bn(out))
        out = ConvBlock(self.out_dim, 1, relu=False, dtype=self.dtype)(out, train)
        return out + residual


def upsample_nearest_2x(x):
    """Exact torch nn.Upsample(scale_factor=2, mode='nearest') on NHWC."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class HourglassBlock(nn.Module):
    """Reference recursive Hourglass(n, f): down path, recursion, nearest-up."""
    n: int
    f: int
    increase: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = self.f + self.increase
        up1 = ResidualBlock(self.f, self.dtype)(x, train)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = ResidualBlock(nf, self.dtype)(low, train)
        if self.n > 1:
            low = HourglassBlock(self.n - 1, nf, 0, self.dtype)(low, train)
        else:
            low = ResidualBlock(nf, self.dtype)(low, train)
        low = ResidualBlock(self.f, self.dtype)(low, train)
        return up1 + upsample_nearest_2x(low)


class Merge(nn.Module):
    """Reference Merge: 1x1 conv, no bn/relu."""
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return ConvBlock(self.out_dim, 1, relu=False, bn=False,
                         dtype=self.dtype)(x, train)
