"""ResNet-50/101 and ResNeXt-50/101 encoders (NHWC flax).

Standard torchvision ResNet-v1 bottleneck architecture, which the reference
wraps (pytorch/bts.py:281-296); skips at relu/layer1..layer4. The TF twin is
slim resnet_v1 modified to return skips (tensorflow/resnet_v1.py:216-219).

feat_out_channels: [64, 256, 512, 1024, 2048] for all four variants.
ResNeXt: grouped 3x3 convs — resnext50 groups=32 width=4, resnext101
groups=32 width=8 (torchvision conventions).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from bts_tpu.models.layers import BatchNorm, Conv

Dtype = Any


class Bottleneck(nn.Module):
    planes: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        identity = x
        y = Conv(width, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, train=train)
        y = nn.relu(y)
        y = Conv(
            width,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=1,
            groups=self.groups,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = BatchNorm(dtype=self.dtype, name="bn2")(y, train=train)
        y = nn.relu(y)
        y = Conv(out_ch, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = BatchNorm(dtype=self.dtype, name="bn3")(y, train=train)
        if self.downsample:
            identity = Conv(
                out_ch,
                (1, 1),
                strides=(self.strides, self.strides),
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, train=train
            )
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """Returns the 5 BTS skip features: [relu, layer1..layer4]."""

    layer_config: Tuple[int, int, int, int]
    groups: int = 1
    base_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        x = Conv(
            64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype, name="conv1"
        )(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, train=train)
        x = nn.relu(x)
        skips.append(x)  # 'relu' — H/2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (64, 128, 256, 512)
        for li, (blocks, p) in enumerate(zip(self.layer_config, planes)):
            strides = 1 if li == 0 else 2
            for bi in range(blocks):
                x = Bottleneck(
                    planes=p,
                    strides=strides if bi == 0 else 1,
                    downsample=(bi == 0),
                    groups=self.groups,
                    base_width=self.base_width,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)
            skips.append(x)  # layer1 H/4, layer2 H/8, layer3 H/16, layer4 H/32
        return skips


def resnet50(dtype=jnp.float32) -> ResNetEncoder:
    return ResNetEncoder((3, 4, 6, 3), dtype=dtype)


def resnet101(dtype=jnp.float32) -> ResNetEncoder:
    return ResNetEncoder((3, 4, 23, 3), dtype=dtype)


def resnext50(dtype=jnp.float32) -> ResNetEncoder:
    return ResNetEncoder((3, 4, 6, 3), groups=32, base_width=4, dtype=dtype)


def resnext101(dtype=jnp.float32) -> ResNetEncoder:
    return ResNetEncoder((3, 4, 23, 3), groups=32, base_width=8, dtype=dtype)
