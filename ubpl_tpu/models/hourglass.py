"""Stacked hourglass heatmap-regression model (reference models/pose/hourglass.py).

TPU-native flax re-design: channel-last, static stack loop, outputs
[B, S, 64, 64, K] heatmap stacks plus (mode != "default") projected feature
stacks [B, S, 32, 32, 256] for the UBPL feature-decorrelation loss.
"""
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvBlock, ResidualBlock, HourglassBlock, Merge


class StackedHourglass(nn.Module):
    """Newell stacked hourglass.

    k: #joints; n_stack: #stacks ("HG3" -> 3); mode: feature tap —
    "default" (no features) | "MaxPool" | "AvgPool" | "ConvOne"
    (reference hourglass.py:92-98; its ConvOne branch declares a 128-ch conv
    that cannot run on the 256-ch features — we implement the working 256-ch
    equivalent).
    """
    k: int
    n_stack: int = 3
    mode: str = "AvgPool"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, imgs, train: bool = True):
        dt = self.dtype
        # stem: [B,256,256,3] -> [B,64,64,256] (reference hourglass.py:21-27)
        x = ConvBlock(64, 7, 2, bn=True, relu=True, dtype=dt)(imgs, train)
        x = ResidualBlock(128, dt)(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ResidualBlock(128, dt)(x, train)
        x = ResidualBlock(256, dt)(x, train)

        preds_all, feats_all = [], []
        for i in range(self.n_stack):
            hg = HourglassBlock(4, 256, 0, dt)(x, train)
            feature = ResidualBlock(256, dt)(hg, train)
            feature = ConvBlock(256, 1, bn=True, relu=True, dtype=dt)(feature, train)
            if self.mode != "default":
                feats_all.append(self._project(feature))
            preds = ConvBlock(self.k, 1, bn=False, relu=False, dtype=dt)(feature, train)
            preds_all.append(preds)
            if i < self.n_stack - 1:
                x = x + Merge(256, dt)(preds, train) + Merge(256, dt)(feature, train)

        preds = jnp.stack(preds_all, axis=1)  # [B, S, 64, 64, K]
        if self.mode == "default":
            return preds
        return preds, jnp.stack(feats_all, axis=1)  # [B, S, 32, 32, 256]

    def _project(self, feature):
        if self.mode == "MaxPool":
            return nn.max_pool(feature, (2, 2), strides=(2, 2))
        if self.mode == "AvgPool":
            return nn.avg_pool(feature, (2, 2), strides=(2, 2))
        if self.mode == "ConvOne":
            return ConvBlock(256, 1, bn=False, relu=False,
                             dtype=self.dtype)(feature)
        raise ValueError(f"unknown feature mode {self.mode}")
