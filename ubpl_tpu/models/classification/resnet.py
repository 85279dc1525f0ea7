"""CIFAR ResNet with dual heads + FDL tap (reference models/classification/ResNet.py)."""
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..layers import torch_kernel_init

CFG = {
    "ResNet18": (2, 2, 2, 2),
    "ResNet34": (3, 4, 6, 3),
    "ResNet50": (3, 4, 6, 3),
    "ResNet101": (3, 4, 23, 3),
    "ResNet152": (3, 8, 36, 3),
}


class _BN(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


class BasicBlock(nn.Module):
    out_dim: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Conv(self.out_dim, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, kernel_init=torch_kernel_init,
                    dtype=self.dtype)(x)
        y = nn.relu(_BN(self.dtype)(y, train))
        y = nn.Conv(self.out_dim, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype)(y)
        y = _BN(self.dtype)(y, train)
        sc = x
        if self.stride != 1 or x.shape[-1] != self.out_dim * self.expansion:
            sc = nn.Conv(self.out_dim * self.expansion, (1, 1),
                         strides=(self.stride,) * 2, use_bias=False,
                         kernel_init=torch_kernel_init, dtype=self.dtype)(x)
            sc = _BN(self.dtype)(sc, train)
        return nn.relu(y + sc)


class Bottleneck(nn.Module):
    out_dim: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.Conv(self.out_dim, (1, 1), use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype)(x)
        y = nn.relu(_BN(self.dtype)(y, train))
        y = nn.Conv(self.out_dim, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, kernel_init=torch_kernel_init,
                    dtype=self.dtype)(y)
        y = nn.relu(_BN(self.dtype)(y, train))
        y = nn.Conv(self.out_dim * self.expansion, (1, 1), use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype)(y)
        y = _BN(self.dtype)(y, train)
        sc = x
        if self.stride != 1 or x.shape[-1] != self.out_dim * self.expansion:
            sc = nn.Conv(self.out_dim * self.expansion, (1, 1),
                         strides=(self.stride,) * 2, use_bias=False,
                         kernel_init=torch_kernel_init, dtype=self.dtype)(x)
            sc = _BN(self.dtype)(sc, train)
        return nn.relu(y + sc)


class ResNet(nn.Module):
    num_classes: int = 10
    model_type: str = "ResNet18"
    mode: str = "default"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        block = BasicBlock if self.model_type in ("ResNet18", "ResNet34") else Bottleneck
        nums = CFG[self.model_type]
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype)(x)
        x = nn.relu(_BN(self.dtype)(x, train))
        feat = None
        for i, (ch, n) in enumerate(zip((64, 128, 256, 512), nums)):
            stride = 1 if i == 0 else 2
            for j in range(n):
                x = block(ch, stride if j == 0 else 1, self.dtype)(x, train)
            if i == 2 and self.mode != "default":
                if self.mode == "MaxPool":
                    feat = nn.max_pool(x, (2, 2), strides=(2, 2))
                elif self.mode == "AvgPool":
                    feat = nn.avg_pool(x, (2, 2), strides=(2, 2))
                else:
                    feat = nn.Conv(x.shape[-1], (1, 1), use_bias=False,
                                   kernel_init=torch_kernel_init,
                                   dtype=self.dtype)(x)
        x = nn.avg_pool(x, (4, 4), strides=(4, 4))
        x = x.reshape(x.shape[0], -1)
        x1 = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        x2 = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        if self.mode == "default":
            return x1, x2
        return (x1, x2), feat
