"""CIFAR MobileNet-v1 with dual heads + FDL tap (reference models/classification/MobileNet.py)."""
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..layers import torch_kernel_init


class MobileNet(nn.Module):
    num_classes: int = 10
    mode: str = "default"
    dtype: Optional[jnp.dtype] = None

    def _bn(self, x, train):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)

    def _conv_bn(self, x, out, stride, train):
        x = nn.Conv(out, (3, 3), strides=(stride,) * 2, padding=1,
                    use_bias=False, kernel_init=torch_kernel_init,
                    dtype=self.dtype)(x)
        return nn.relu(self._bn(x, train))

    def _conv_dw(self, x, out, stride, train):
        inp = x.shape[-1]
        x = nn.Conv(inp, (3, 3), strides=(stride,) * 2, padding=1,
                    feature_group_count=inp, use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype)(x)
        x = nn.relu(self._bn(x, train))
        x = nn.Conv(out, (1, 1), use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype)(x)
        return nn.relu(self._bn(x, train))

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = self._conv_bn(x, 32, 2, train)
        x = self._conv_dw(x, 64, 1, train)
        x = self._conv_dw(x, 96, 2, train)
        x = self._conv_dw(x, 96, 1, train)
        x = self._conv_dw(x, 128, 2, train)
        x = self._conv_dw(x, 128, 1, train)
        feat = None
        if self.mode != "default":
            if self.mode == "MaxPool":
                feat = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif self.mode == "AvgPool":
                feat = nn.avg_pool(x, (2, 2), strides=(2, 2))
            else:
                feat = nn.Conv(128, (1, 1), use_bias=False,
                               kernel_init=torch_kernel_init,
                               dtype=self.dtype)(x)
        x = self._conv_dw(x, 256, 2, train)
        x = self._conv_dw(x, 256, 1, train)
        x = self._conv_dw(x, 512, 1, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x1 = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        x2 = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        if self.mode == "default":
            return x1, x2
        return (x1, x2), feat
