"""LitePose: large-kernel inverted-residual pose net (reference models/pose/LitePose.py).

Single-stack (nStack=1) MobileNet-style backbone (arch2 config) with a
deconv refine/loop head producing two heatmap outputs at 64x64 and 128x128.
The reference returns a Python list of the two maps; we return a tuple so
jit sees static structure.
"""
from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import torch_kernel_init

ARCH2_CFG = (
    ((16, 24, 7, 2), (24, 24, 7, 1), (24, 24, 7, 1), (24, 24, 7, 1), (24, 24, 7, 1), (24, 24, 7, 1)),
    ((24, 64, 7, 2), (64, 64, 7, 1), (64, 64, 7, 1), (64, 64, 7, 1), (64, 64, 7, 1), (64, 64, 7, 1), (64, 64, 7, 1), (64, 64, 7, 1)),
    ((64, 64, 7, 2), (64, 64, 7, 1), (64, 72, 7, 1), (72, 72, 7, 1), (72, 72, 7, 1), (72, 72, 7, 1), (72, 72, 7, 1), (72, 72, 7, 1)),
    ((72, 72, 7, 1), (72, 80, 7, 1), (80, 100, 7, 1), (100, 120, 7, 1), (120, 140, 7, 1), (140, 140, 7, 1), (140, 140, 7, 1), (140, 140, 7, 1), (140, 140, 7, 1), (140, 160, 7, 1)),
)
DECONV_CHANNELS = (48, 24, 24)
DECONV_KERNELS = (4, 4, 4)


class ConvBNBase(nn.Module):
    """Reference ConvBlockBase: conv(no bias) -> BN -> optional ReLU6."""
    out_dim: int
    kernel_size: int
    stride: int = 1
    activation: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.kernel_size
        x = nn.Conv(self.out_dim, (k, k), strides=(self.stride,) * 2,
                    padding=[(k // 2,) * 2] * 2, use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        if self.activation:
            x = jnp.clip(x, 0.0, 6.0)  # ReLU6
        return x


class ConvMobileBlock(nn.Module):
    """Reference ConvMobileBlock: 1-k-1 inverted residual, skip when shapes match."""
    out_dim: int
    kernel_size: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dim = x.shape[-1]
        mid = in_dim + self.out_dim // 2
        y = ConvBNBase(mid, 1, activation=False, dtype=self.dtype)(x, train)
        y = ConvBNBase(mid, self.kernel_size, self.stride, activation=False,
                       dtype=self.dtype)(y, train)
        y = ConvBNBase(self.out_dim, 1, dtype=self.dtype)(y, train)
        if in_dim == self.out_dim and self.stride == 1:
            y = y + x
        return y


class LitePose(nn.Module):
    k: int
    mode: str = "default"
    arch: Sequence = ARCH2_CFG
    dtype: Optional[jnp.dtype] = None

    n_stack: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        # stem (reference c1): 3 -> 32 -> 16, /2
        x = ConvBNBase(32, 3, 2, dtype=dt)(x, train)
        x = ConvBNBase(16, 3, 1, dtype=dt)(x, train)

        checkpoints = [x]
        channels = [16]
        for stage in self.arch:
            for (_, out_c, ksz, stride) in stage:
                x = ConvMobileBlock(out_c, ksz, stride, dt)(x, train)
            checkpoints.append(x)
            channels.append(stage[-1][1])

        outputs = []
        for l in range(len(DECONV_CHANNELS)):
            ch = DECONV_CHANNELS[l]
            ksz = DECONV_KERNELS[l]
            x = nn.ConvTranspose(ch, (ksz, ksz), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 kernel_init=torch_kernel_init, dtype=dt)(x)
            loop = nn.ConvTranspose(ch, (ksz, ksz), strides=(2, 2),
                                    padding="SAME", use_bias=False,
                                    kernel_init=torch_kernel_init,
                                    dtype=dt)(checkpoints[-l - 2])
            x = x + loop
            if l > 0:
                ff = ConvBNBase(ch, 5, dtype=dt)(x, train)
                ff = ConvBNBase(self.k, 5, dtype=dt)(ff, train)
                raw = checkpoints[-l - 3]
                fl = ConvBNBase(raw.shape[-1], 5, dtype=dt)(raw, train)
                fl = ConvBNBase(self.k, 5, dtype=dt)(fl, train)
                outputs.append(ff + fl)

        if self.mode == "default":
            return tuple(outputs)
        # feature tap for FDL parity with the hourglass interface
        feat = outputs[0]
        if self.mode == "MaxPool":
            feat = nn.max_pool(feat, (2, 2), strides=(2, 2))
        elif self.mode == "AvgPool":
            feat = nn.avg_pool(feat, (2, 2), strides=(2, 2))
        return tuple(outputs), feat[:, None]
