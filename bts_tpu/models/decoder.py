"""BTS decoder: U-Net with Dense-ASPP and multi-scale Local Planar Guidance.

Re-designed TPU-first (NHWC, pure-functional flax) from the behavior of the
reference decoder (pytorch/bts.py:148-266; TF twin tensorflow/bts.py:237-345).
All tensor semantics (channel widths, skip wiring, BN placement/eps, the
DASPP cascade, LPG scales, depth head) match the PT reference exactly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bts_tpu.models.layers import (
    BatchNorm,
    Conv,
    DECODER_BN_EPS,
    SplitConv,
    TORCH_BN_MOMENTUM_DECODER,
    downsample_nearest,
    upsample_nearest,
)
from bts_tpu.ops.lpg import (
    decode_plane_eq,
    local_planar_guidance,
    normalize_plane,
)

Dtype = Any


class UpConv(nn.Module):
    """2x nearest upsample -> 3x3 conv -> ELU (pytorch/bts.py:69-80).

    Fused TPU form: conv3x3(nearest_up2(x)) is computed as ONE
    lhs-dilated convolution with the 4x4 composite kernel
        c[m, n] = sum_{a,b in {0,1}} k[m-a, n-b]
    (the nearest upsample is itself a convolution of the 2x-dilated input
    with a 2x2 ones kernel; composing the two cross-correlations gives c).
    Mathematically identical to upsample+conv, but never materializes the
    4x-larger upsampled intermediate. Param tree matches Conv
    ('conv/kernel', 3x3) so checkpoints/converters are unaffected.
    """

    features: int
    ratio: int = 2
    dtype: Dtype = jnp.float32
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        inner = _UpConvInner(
            features=self.features,
            ratio=self.ratio,
            fused=self.fused and self.ratio == 2,
            dtype=self.dtype,
            name="conv",
        )
        return nn.elu(inner(x))


class _UpConvInner(nn.Module):
    """Shared kernel for both upconv paths: param path 'conv/kernel'."""

    features: int
    ratio: int
    fused: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (3, 3, cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(self.dtype) == jnp.float32
            else None
        )
        if not self.fused:
            x = upsample_nearest(x, self.ratio)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel,
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision,
            )
        # Composite 4x4 kernel: sum of the 2x2 nearest-up shifts of k.
        c = jnp.zeros((4, 4, cin, self.features), self.dtype)
        for a in (0, 1):
            for b in (0, 1):
                c = c.at[a : a + 3, b : b + 3].add(kernel)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            c,
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )


class AtrousConv(nn.Module):
    """(optional BN) -> ReLU -> 1x1 conv(2C) -> BN -> ReLU -> 3x3 dilated conv.

    Reference: pytorch/bts.py:51-66. First BN eps=1.1e-5; inner BN uses the
    torch default eps=1e-5 (both momentum 0.01).
    """

    features: int
    dilation: int
    apply_bn_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.apply_bn_first:
            x = BatchNorm(
                torch_momentum=TORCH_BN_MOMENTUM_DECODER,
                epsilon=DECODER_BN_EPS,
                dtype=self.dtype,
                name="first_bn",
            )(x, train=train)
        x = nn.relu(x)
        x = Conv(self.features * 2, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(
            torch_momentum=TORCH_BN_MOMENTUM_DECODER,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn2",
        )(x, train=train)
        x = nn.relu(x)
        x = Conv(
            self.features,
            (3, 3),
            padding=self.dilation,
            dilation=self.dilation,
            dtype=self.dtype,
            name="conv2",
        )(x)
        return x


class Reduction1x1(nn.Module):
    """Chain of 1x1 convs halving channels to <8, ending in a 1-channel
    sigmoid head (final) or a 3-channel plane-parameter head decoded to a
    unit plane equation (pytorch/bts.py:83-122).
    """

    num_out_filters: int
    max_depth: float
    is_final: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_out = self.num_out_filters
        i = 0
        while num_out >= 4:
            if num_out < 8:
                if self.is_final:
                    x = Conv(1, (1, 1), dtype=self.dtype, name="final")(x)
                    return jax.nn.sigmoid(x)
                x = Conv(3, (1, 1), dtype=self.dtype, name="plane_params")(x)
                return decode_plane_eq(
                    x.astype(jnp.float32), self.max_depth
                )
            x = Conv(num_out, (1, 1), dtype=self.dtype, name=f"inter_{i}")(x)
            x = nn.elu(x)
            num_out //= 2
            i += 1
        raise ValueError("num_out_filters must be >= 4")


class BTSDecoder(nn.Module):
    """The full BTS decoder.

    Input: 5 skip features [H/2, H/4, H/8, H/16, H/32] (NHWC) + focal (B,).
    Output: (depth_8x8_scaled, depth_4x4_scaled, depth_2x2_scaled, reduc1x1,
    final_depth), each (B, H, W, 1) except the scaled LPG maps which are at
    full resolution like the reference (pytorch/bts.py:196-266).
    """

    max_depth: float
    dataset: str = "nyu"
    num_features: int = 512
    lpg_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], focal, train: bool = False):
        nf = self.num_features
        dt = self.dtype
        skip0, skip1, skip2, skip3 = features[0], features[1], features[2], features[3]
        dense_features = nn.relu(features[4])

        def bn(name):
            return BatchNorm(
                torch_momentum=TORCH_BN_MOMENTUM_DECODER,
                epsilon=DECODER_BN_EPS,
                dtype=dt,
                name=name,
            )

        # H/16
        upconv5 = UpConv(nf, dtype=dt, name="upconv5")(dense_features)
        upconv5 = bn("bn5")(upconv5, train=train)
        concat5 = jnp.concatenate([upconv5, skip3], axis=-1)
        iconv5 = nn.elu(Conv(nf, (3, 3), padding=1, dtype=dt, name="conv5")(concat5))

        # H/8
        upconv4 = UpConv(nf // 2, dtype=dt, name="upconv4")(iconv5)
        upconv4 = bn("bn4")(upconv4, train=train)
        concat4 = jnp.concatenate([upconv4, skip2], axis=-1)
        iconv4 = nn.elu(Conv(nf // 2, (3, 3), padding=1, dtype=dt, name="conv4")(concat4))
        iconv4 = bn("bn4_2")(iconv4, train=train)

        # Dense-ASPP cascade (rates 3/6/12/18/24), each atrous conv consuming
        # the concat of everything before it (pytorch/bts.py:210-220).
        daspp_3 = AtrousConv(nf // 4, 3, apply_bn_first=False, dtype=dt, name="daspp_3")(
            iconv4, train=train
        )
        concat4_2 = jnp.concatenate([concat4, daspp_3], axis=-1)
        daspp_6 = AtrousConv(nf // 4, 6, dtype=dt, name="daspp_6")(concat4_2, train=train)
        concat4_3 = jnp.concatenate([concat4_2, daspp_6], axis=-1)
        daspp_12 = AtrousConv(nf // 4, 12, dtype=dt, name="daspp_12")(concat4_3, train=train)
        concat4_4 = jnp.concatenate([concat4_3, daspp_12], axis=-1)
        daspp_18 = AtrousConv(nf // 4, 18, dtype=dt, name="daspp_18")(concat4_4, train=train)
        concat4_5 = jnp.concatenate([concat4_4, daspp_18], axis=-1)
        daspp_24 = AtrousConv(nf // 4, 24, dtype=dt, name="daspp_24")(concat4_5, train=train)
        concat4_daspp = jnp.concatenate(
            [iconv4, daspp_3, daspp_6, daspp_12, daspp_18, daspp_24], axis=-1
        )
        daspp_feat = nn.elu(
            Conv(nf // 4, (3, 3), padding=1, dtype=dt, name="daspp_conv")(concat4_daspp)
        )

        # 8x8 plane head + LPG (full resolution)
        # LPG plane decode stays f32 (trig on low-res tensors, cheap); the
        # full-res depth maps are produced directly in the compute dtype so
        # no conversion copies materialize at 128-lane-padded C=1 layouts.
        plane_eq_8x8 = Reduction1x1(
            nf // 4, self.max_depth, dtype=dt, name="reduc8x8"
        )(daspp_feat)
        plane_eq_8x8 = normalize_plane(plane_eq_8x8)
        depth_8x8 = local_planar_guidance(plane_eq_8x8, 8, impl=self.lpg_impl)
        depth_8x8_scaled = (depth_8x8 / self.max_depth).astype(dt)[..., None]
        depth_8x8_scaled_ds = downsample_nearest(depth_8x8_scaled, 4)

        # H/4
        upconv3 = UpConv(nf // 4, dtype=dt, name="upconv3")(daspp_feat)
        upconv3 = bn("bn3")(upconv3, train=train)
        iconv3 = nn.elu(
            SplitConv(nf // 4, (3, 3), padding=1, dtype=dt, name="conv3")(
                [upconv3, skip1, depth_8x8_scaled_ds.astype(dt)]
            )
        )

        plane_eq_4x4 = Reduction1x1(
            nf // 8, self.max_depth, dtype=dt, name="reduc4x4"
        )(iconv3)
        plane_eq_4x4 = normalize_plane(plane_eq_4x4)
        depth_4x4 = local_planar_guidance(plane_eq_4x4, 4, impl=self.lpg_impl)
        depth_4x4_scaled = (depth_4x4 / self.max_depth).astype(dt)[..., None]
        depth_4x4_scaled_ds = downsample_nearest(depth_4x4_scaled, 2)

        # H/2
        upconv2 = UpConv(nf // 8, dtype=dt, name="upconv2")(iconv3)
        upconv2 = bn("bn2")(upconv2, train=train)
        iconv2 = nn.elu(
            SplitConv(nf // 8, (3, 3), padding=1, dtype=dt, name="conv2")(
                [upconv2, skip0, depth_4x4_scaled_ds.astype(dt)]
            )
        )

        plane_eq_2x2 = Reduction1x1(
            nf // 16, self.max_depth, dtype=dt, name="reduc2x2"
        )(iconv2)
        plane_eq_2x2 = normalize_plane(plane_eq_2x2)
        depth_2x2 = local_planar_guidance(plane_eq_2x2, 2, impl=self.lpg_impl)
        depth_2x2_scaled = (depth_2x2 / self.max_depth).astype(dt)[..., None]

        # H (full)
        upconv1 = UpConv(nf // 16, dtype=dt, name="upconv1")(iconv2)
        reduc1x1 = Reduction1x1(
            nf // 32, self.max_depth, is_final=True, dtype=dt, name="reduc1x1"
        )(upconv1)
        # SplitConv == Conv(concat(...)) exactly, without materializing the
        # lane-padded C=1 concat (see layers.SplitConv docstring).
        iconv1 = nn.elu(
            SplitConv(nf // 16, (3, 3), padding=1, dtype=dt, name="conv1")(
                [
                    upconv1,
                    reduc1x1.astype(dt),
                    depth_2x2_scaled,
                    depth_4x4_scaled,
                    depth_8x8_scaled,
                ]
            )
        )
        depth_logits = Conv(1, (3, 3), padding=1, dtype=dt, name="get_depth")(iconv1)
        final_depth = self.max_depth * jax.nn.sigmoid(
            depth_logits.astype(jnp.float32)
        )
        if self.dataset == "kitti":
            # KITTI focal scaling (pytorch/bts.py:263-264).
            final_depth = final_depth * (
                focal.astype(jnp.float32)[:, None, None, None] / 715.0873
            )

        return (
            depth_8x8_scaled.astype(jnp.float32),
            depth_4x4_scaled.astype(jnp.float32),
            depth_2x2_scaled.astype(jnp.float32),
            reduc1x1.astype(jnp.float32),
            final_depth,
        )
