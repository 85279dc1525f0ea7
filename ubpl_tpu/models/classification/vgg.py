"""CIFAR VGG with dual FC heads + FDL feature tap (reference models/classification/VGG.py).

All classifiers in this family return ((logits1, logits2), features) when a
feature mode is set, else (logits1, logits2) — mirroring the reference's
dual-head pattern used by the classification SSL branch.
"""
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..layers import torch_kernel_init

CFG = {
    "VGG11": ([64, "M", 128, "M", 256, 256, "M", 512, 512], ["M", 512, 512, "M"]),
    "VGG13": ([64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512], ["M", 512, 512, "M"]),
    "VGG16": ([64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512], ["M", 512, 512, 512, "M"]),
    "VGG19": ([64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512], ["M", 512, 512, 512, 512, "M"]),
}


class VGG(nn.Module):
    num_classes: int = 10
    model_type: str = "VGG11"
    mode: str = "default"
    dtype: Optional[jnp.dtype] = None

    def _block(self, x, cfg, train):
        for p in cfg:
            if p == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(p, (3, 3), padding=1, kernel_init=torch_kernel_init,
                            dtype=self.dtype)(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype)(x)
                x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, x, train: bool = True):
        c1, c2 = CFG[self.model_type]
        x = self._block(x, c1, train)
        feat = None
        if self.mode != "default":
            if self.mode == "MaxPool":
                feat = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif self.mode == "AvgPool":
                feat = nn.avg_pool(x, (2, 2), strides=(2, 2))
            else:
                feat = nn.Conv(512, (1, 1), use_bias=False,
                               kernel_init=torch_kernel_init,
                               dtype=self.dtype)(x)
        x = self._block(x, c2, train)
        x = x.reshape(x.shape[0], -1)
        x1 = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        x2 = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        if self.mode == "default":
            return x1, x2
        return (x1, x2), feat
