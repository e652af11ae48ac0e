"""DenseNet-121/161 encoders (NHWC flax), skip harvesting per the reference.

Architecture follows the standard torchvision DenseNet (Huang et al. 2017),
which is what the reference wraps (pytorch/bts.py:273-280): conv7x7/2 ->
BN -> ReLU [skip0] -> maxpool3x3/2 [skip1] -> denseblock1 -> transition1
[skip2] -> denseblock2 -> transition2 [skip3] -> denseblock3 -> transition3
-> denseblock4 -> norm5 [final, pre-ReLU]. The TF twin hand-builds the same
graph (tensorflow/bts.py:105-235).

feat_out_channels: densenet121 [64,64,128,256,1024];
densenet161 [96,96,192,384,2208] (pytorch/bts.py:276,280).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from bts_tpu.models.layers import BatchNorm, Conv

Dtype = Any


class DenseLayer(nn.Module):
    """BN -> ReLU -> 1x1 conv(4g) -> BN -> ReLU -> 3x3 conv(g); concat."""

    growth_rate: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BatchNorm(dtype=self.dtype, name="norm1")(x, train=train)
        y = nn.relu(y)
        y = Conv(4 * self.growth_rate, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = BatchNorm(dtype=self.dtype, name="norm2")(y, train=train)
        y = nn.relu(y)
        y = Conv(self.growth_rate, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = DenseLayer(
                self.growth_rate, dtype=self.dtype, name=f"denselayer{i + 1}"
            )(x, train=train)
        return x


class Transition(nn.Module):
    """BN -> ReLU -> 1x1 conv(C/2) -> avgpool 2x2/2."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(dtype=self.dtype, name="norm")(x, train=train)
        x = nn.relu(x)
        x = Conv(self.out_features, (1, 1), dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetEncoder(nn.Module):
    """Returns the 5 BTS skip features (pytorch/bts.py:305-320)."""

    block_config: Tuple[int, int, int, int]
    growth_rate: int
    num_init_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        x = Conv(
            self.num_init_features,
            (7, 7),
            strides=(2, 2),
            padding=3,
            dtype=self.dtype,
            name="conv0",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="norm0")(x, train=train)
        x = nn.relu(x)
        skips.append(x)  # 'relu0' — H/2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        skips.append(x)  # 'pool0' — H/4

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(
                num_layers, self.growth_rate, dtype=self.dtype, name=f"denseblock{i + 1}"
            )(x, train=train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features //= 2
                x = Transition(
                    num_features, dtype=self.dtype, name=f"transition{i + 1}"
                )(x, train=train)
                if i < 2:
                    skips.append(x)  # 'transition1' H/8, 'transition2' H/16
        x = BatchNorm(dtype=self.dtype, name="norm5")(x, train=train)
        skips.append(x)  # 'norm5' — H/32, pre-ReLU (decoder applies ReLU)
        return skips


def densenet121(dtype=jnp.float32) -> DenseNetEncoder:
    return DenseNetEncoder((6, 12, 24, 16), 32, 64, dtype=dtype)


def densenet161(dtype=jnp.float32) -> DenseNetEncoder:
    return DenseNetEncoder((6, 12, 36, 24), 48, 96, dtype=dtype)
