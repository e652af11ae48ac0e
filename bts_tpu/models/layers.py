"""Shared NN building blocks (NHWC, flax.linen).

Conventions:
  * All convs are bias-free unless stated (reference decoder convs are
    bias=False, pytorch/bts.py:59-62,73,94-104,156-193).
  * Strided convs use explicit padding tuples — torch's Conv2d(padding=p)
    semantics, NOT XLA 'SAME' (which pads asymmetrically on even inputs).
  * BatchNorm momentum: torch momentum m updates ra = (1-m)*ra + m*batch;
    flax momentum f updates ra = f*ra + (1-f)*batch, so flax_m = 1 - torch_m.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Decoder BN hyperparams (reference: pytorch/bts.py:56,154 — momentum=0.01,
# eps=1.1e-5 for the named decoder BNs; the inner atrous BN uses the torch
# default eps=1e-5, pytorch/bts.py:60).
TORCH_BN_MOMENTUM_DECODER = 0.01
DECODER_BN_EPS = 1.1e-5
TORCH_BN_MOMENTUM_ENCODER = 0.1
ENCODER_BN_EPS = 1e-5


def _pad(p: Union[int, Tuple[int, int]]):
    if isinstance(p, int):
        p = (p, p)
    return ((p[0], p[0]), (p[1], p[1]))


class Conv(nn.Module):
    """torch-semantics Conv2d on NHWC tensors."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    # Xavier-uniform matches the reference decoder init
    # (weights_init_xavier, pytorch/bts.py:34-38); encoder convs are
    # normally overwritten by pretrained weights.
    kernel_init: Any = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x):
        # In f32 mode force true-f32 accumulation (Precision.HIGHEST) so
        # numerics match the reference; in bf16 mode let the MXU run at
        # native bf16 speed (default precision).
        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(self.dtype) == jnp.float32
            else None
        )
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=_pad(self.padding),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            precision=precision,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm2d (affine, running stats)."""

    torch_momentum: float = TORCH_BN_MOMENTUM_ENCODER
    epsilon: float = ENCODER_BN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.torch_momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)


def upsample_nearest(x, scale: int):
    """Nearest-neighbor 2x/kx upsample, NHWC.

    Matches torch F.interpolate(mode='nearest', scale_factor=k)
    (pytorch/bts.py:77): out[i] = in[i // k]. Single broadcast+reshape (one
    materialization) instead of two sequential jnp.repeat passes.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, scale, w, scale, c)
    )
    return x.reshape(b, h * scale, w * scale, c)


def downsample_nearest(x, inv_scale: int):
    """Nearest downsample by integer factor, NHWC.

    Matches torch F.interpolate(mode='nearest', scale_factor=1/k) for
    integer k (pytorch/bts.py:229,243): out[i] = in[floor(i * k)] = in[::k].
    """
    return x[:, ::inv_scale, ::inv_scale, :]
