"""MobileNetV2 encoder (NHWC flax).

Standard torchvision MobileNetV2 (Sandler et al. 2018), which the reference
wraps (pytorch/bts.py:297-301), harvesting skips after feature modules
1, 3, 6, 10, 18 (1-based i == 2, 4, 7, 11, 19 in pytorch/bts.py:313-315).

feat_out_channels: [16, 24, 32, 64, 1280].
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from bts_tpu.models.layers import BatchNorm, Conv

Dtype = Any

# (expand_ratio, out_channels, num_blocks, first_stride)
_INVERTED_RESIDUAL_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
# Skips collected after these 0-based feature-module indices.
_SKIP_AFTER = (1, 3, 6, 10, 18)


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=pad,
            groups=self.groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train=train)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    strides: int
    expand_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.strides == 1 and in_ch == self.out_channels
        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU6(hidden, kernel=1, dtype=self.dtype, name="expand")(
                y, train=train
            )
        y = ConvBNReLU6(
            hidden,
            kernel=3,
            strides=self.strides,
            groups=hidden,
            dtype=self.dtype,
            name="depthwise",
        )(y, train=train)
        y = Conv(self.out_channels, (1, 1), dtype=self.dtype, name="project")(y)
        y = BatchNorm(dtype=self.dtype, name="project_bn")(y, train=train)
        return x + y if use_res else y


class MobileNetV2Encoder(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        idx = 0
        x = ConvBNReLU6(32, strides=2, dtype=self.dtype, name=f"features_{idx}")(
            x, train=train
        )
        for t, c, n, s in _INVERTED_RESIDUAL_CFG:
            for bi in range(n):
                idx += 1
                x = InvertedResidual(
                    c,
                    strides=s if bi == 0 else 1,
                    expand_ratio=t,
                    dtype=self.dtype,
                    name=f"features_{idx}",
                )(x, train=train)
                if idx in _SKIP_AFTER:
                    skips.append(x)
        idx += 1
        x = ConvBNReLU6(1280, kernel=1, dtype=self.dtype, name=f"features_{idx}")(
            x, train=train
        )
        skips.append(x)  # features_18 — 1280ch, H/32
        return skips


def mobilenetv2(dtype=jnp.float32) -> MobileNetV2Encoder:
    return MobileNetV2Encoder(dtype=dtype)
