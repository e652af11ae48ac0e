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
    downsample_nearest_ac,
    upsample_nearest,
)
from bts_tpu.ops.lpg import (
    decode_plane_eq,
    depth_to_space_phases,
    local_planar_guidance,
    lpg_expand,
    lpg_s2d,
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
    use_bias: bool = False  # TF-flavor decoder convs carry biases

    @nn.compact
    def __call__(self, x):
        inner = _UpConvInner(
            features=self.features,
            ratio=self.ratio,
            fused=self.fused and self.ratio == 2,
            dtype=self.dtype,
            use_bias=self.use_bias,
            name="conv",
        )
        return nn.elu(inner(x))


class _UpConvInner(nn.Module):
    """Shared kernel for both upconv paths: param path 'conv/kernel'."""

    features: int
    ratio: int
    fused: bool
    dtype: Dtype
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (3, 3, cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ).astype(self.dtype)
            if self.use_bias
            else None
        )
        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(self.dtype) == jnp.float32
            else None
        )
        if not self.fused:
            x = upsample_nearest(x, self.ratio)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel,
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision,
            )
            return out if bias is None else out + bias
        # Composite 4x4 kernel: sum of the 2x2 nearest-up shifts of k.
        c = jnp.zeros((4, 4, cin, self.features), self.dtype)
        for a in (0, 1):
            for b in (0, 1):
                c = c.at[a : a + 3, b : b + 3].add(kernel)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            c,
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        return out if bias is None else out + bias


class AtrousConv(nn.Module):
    """(optional BN) -> ReLU -> 1x1 conv(2C) -> BN -> ReLU -> 3x3 dilated conv.

    Reference: pytorch/bts.py:51-66. First BN eps=1.1e-5; inner BN uses the
    torch default eps=1e-5 (both momentum 0.01).

    tf_variant reproduces the TF twin (tensorflow/bts.py:84-100 built under
    the decoder arg_scope at :346-349,404-405): convs carry biases, the 1x1
    conv gets the arg-scope ELU before the inner BN, the inner BN uses
    eps=1.1e-5 (the decoder-wide batch_norm_params), and — crucially for
    border numerics — the input is zero-padded by pk+rate-1 BEFORE the
    first BN (tensorflow/bts.py:85-88), so the pad band flows through
    BN/ReLU/conv1x1(+bias)/ELU/BN/ReLU and reaches the dilated conv as
    NONZERO values; the dilated 3x3 then runs VALID. The PT twin instead
    zero-pads inside the dilated conv (pytorch/bts.py:60-64).
    """

    features: int
    dilation: int
    apply_bn_first: bool = True
    dtype: Dtype = jnp.float32
    tf_variant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.tf_variant:
            # pk + pr with pk=1 (3x3) and pr=rate-1 => pad by `rate`.
            p = self.dilation
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        if self.apply_bn_first:
            x = BatchNorm(
                torch_momentum=TORCH_BN_MOMENTUM_DECODER,
                epsilon=DECODER_BN_EPS,
                dtype=self.dtype,
                name="first_bn",
            )(x, train=train)
        x = nn.relu(x)
        x = Conv(
            self.features * 2,
            (1, 1),
            use_bias=self.tf_variant,
            dtype=self.dtype,
            name="conv1",
        )(x)
        if self.tf_variant:
            x = nn.elu(x)
        x = BatchNorm(
            torch_momentum=TORCH_BN_MOMENTUM_DECODER,
            epsilon=DECODER_BN_EPS if self.tf_variant else 1e-5,
            dtype=self.dtype,
            name="bn2",
        )(x, train=train)
        x = nn.relu(x)
        x = Conv(
            self.features,
            (3, 3),
            # TF flavor already padded the input above: VALID here.
            padding=0 if self.tf_variant else self.dilation,
            dilation=self.dilation,
            use_bias=self.tf_variant,
            dtype=self.dtype,
            name="conv2",
        )(x)
        return x


class Reduction1x1(nn.Module):
    """Chain of 1x1 convs halving channels to <8, ending in a 1-channel
    sigmoid head (final) or a 3-channel plane-parameter head decoded to a
    unit plane equation (pytorch/bts.py:83-122).

    theta_max selects the plane-decode convention: pi/3 (PT, default) or
    pi/6 (TF twin, tensorflow/bts.py:152). use_bias gives every conv a
    bias, matching the TF decoder's slim convs (tensorflow/bts.py:145-166
    under the arg scope at :346-349).
    """

    num_out_filters: int
    max_depth: float
    is_final: bool = False
    dtype: Dtype = jnp.float32
    theta_max: float = float(jnp.pi / 3)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        num_out = self.num_out_filters
        i = 0
        while num_out >= 4:
            if num_out < 8:
                if self.is_final:
                    x = Conv(
                        1, (1, 1), use_bias=self.use_bias,
                        dtype=self.dtype, name="final",
                    )(x)
                    return jax.nn.sigmoid(x)
                x = Conv(
                    3, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name="plane_params",
                )(x)
                return decode_plane_eq(
                    x.astype(jnp.float32), self.max_depth, self.theta_max
                )
            x = Conv(
                num_out, (1, 1), use_bias=self.use_bias,
                dtype=self.dtype, name=f"inter_{i}",
            )(x)
            x = nn.elu(x)
            num_out //= 2
            i += 1
        raise ValueError("num_out_filters must be >= 4")


class _ConvKernel(nn.Module):
    """Declares a conv kernel param under '<name>/kernel'."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.xavier_uniform(), self.shape, jnp.float32
        )


class _NamedConvKernel(nn.Module):
    """Kernel holder at path '<name>/conv/kernel' — matches Conv's tree so
    the fast (space-to-depth) tail shares checkpoints with the plain tail."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return _ConvKernel(self.shape, name="conv")()


class _FastReducParams(nn.Module):
    """reduc1x1 params at the standard Reduction1x1 paths (inter_i/final),
    mirroring its channel-halving chain (pytorch/bts.py:91-108)."""

    num_in: int
    num_out: int

    @nn.compact
    def __call__(self):
        kernels = []
        num_in, num_out, i = self.num_in, self.num_out, 0
        while num_out >= 4:
            if num_out < 8:
                kernels.append(
                    _NamedConvKernel((1, 1, num_in, 1), name="final")()
                )
                break
            kernels.append(
                _NamedConvKernel((1, 1, num_in, num_out), name=f"inter_{i}")()
            )
            num_in, num_out, i = num_out, num_out // 2, i + 1
        return kernels


def _s2d_conv3_kernel(k):
    """Transform a full-res 3x3 conv kernel (3,3,Ci,Co) into the equivalent
    space-to-depth-domain 3x3 kernel (3,3,4Ci,4Co).

    Derivation: output phase (a,b) at s2d position i uses full-res rows
    2i+a+m-1 = 2(i+q-1)+c  =>  m = 2q + c - a - 1 (and likewise columns),
    so s2d tap (q,r) from input phase (c,d) to output phase (a,b) carries
    k[2q+c-a-1, 2r+d-b-1] when those indices are in [0,3). Channel blocks
    are phase-major: index = phase*C + ch.
    """
    ci, co = k.shape[2], k.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), k.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                for d in (0, 1):
                    for q in range(3):
                        m = 2 * q + c - a - 1
                        if not 0 <= m < 3:
                            continue
                        for r_ in range(3):
                            n = 2 * r_ + d - b - 1
                            if not 0 <= n < 3:
                                continue
                            p_in = 2 * c + d
                            p_out = 2 * a + b
                            out = out.at[
                                q,
                                r_,
                                p_in * ci : (p_in + 1) * ci,
                                p_out * co : (p_out + 1) * co,
                            ].set(k[m, n])
    return out


def _conv(x, kernel, padding, precision):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def _grouped_1x1(x, k, groups, precision):
    """Per-phase 1x1 conv: same kernel applied to each phase block.

    In bf16 mode the grouped form is computed as a DENSE conv with the
    kernel embedded block-diagonally (same trick as
    layers._BlockDiagGroupedConv): XLA:TPU lowers feature_group_count
    convs at small group width into 5-D reshapes + layout copies that
    dominated the training-step profile (~15 ms/step of the reduc1x1
    chain's fwd+bwd at 416x544 b16). The dense form is exact math — the
    off-diagonal blocks are zeros — and MXU-native. f32 mode keeps the
    grouped lowering so accumulation order matches the reference exactly.
    """
    ci, co = k.shape[2], k.shape[3]
    if x.dtype == jnp.bfloat16:
        dense = jnp.zeros((1, 1, ci * groups, co * groups), k.dtype)
        for g in range(groups):
            dense = dense.at[
                :, :, g * ci : (g + 1) * ci, g * co : (g + 1) * co
            ].set(k)
        return jax.lax.conv_general_dilated(
            x,
            dense,
            window_strides=(1, 1),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
    return jax.lax.conv_general_dilated(
        x,
        jnp.tile(k, (1, 1, 1, groups)),
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


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
    # Space-to-depth tail: exact-math TPU layout optimization (_fast_tail).
    fast_tail: bool = True
    # 'pt' (default): the PyTorch reference's decoder (pytorch/bts.py).
    # 'tf': the TF twin (tensorflow/bts.py:237-345) — convs carry biases,
    # the atrous 1x1 gets an arg-scope ELU, theta_max = pi/6, the final
    # reduc1x1 chain starts one halving earlier (TF passes the full width,
    # tensorflow/bts.py:316), and the LPG guidance maps are downsampled on
    # the align_corners grid. Used for TF-zoo checkpoints
    # (models/convert_tf.convert_full_tf). Runs the plain tail (the s2d
    # fast tail is derived for the bias-free PT form).
    flavor: str = "pt"

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], focal, train: bool = False):
        nf = self.num_features
        dt = self.dtype
        tf_mode = self.flavor == "tf"
        bias = tf_mode
        theta_max = float(jnp.pi / 6) if tf_mode else float(jnp.pi / 3)
        skip0, skip1, skip2, skip3 = features[0], features[1], features[2], features[3]
        dense_features = nn.relu(features[4])

        def bn(name):
            return BatchNorm(
                torch_momentum=TORCH_BN_MOMENTUM_DECODER,
                epsilon=DECODER_BN_EPS,
                dtype=dt,
                name=name,
            )

        def reduc(num_out, is_final=False, name=None):
            return Reduction1x1(
                num_out,
                self.max_depth,
                is_final=is_final,
                dtype=dt,
                theta_max=theta_max,
                use_bias=bias,
                name=name,
            )

        # H/16
        upconv5 = UpConv(nf, dtype=dt, use_bias=bias, name="upconv5")(dense_features)
        upconv5 = bn("bn5")(upconv5, train=train)
        concat5 = jnp.concatenate([upconv5, skip3], axis=-1)
        iconv5 = nn.elu(
            Conv(nf, (3, 3), padding=1, use_bias=bias, dtype=dt, name="conv5")(concat5)
        )

        # H/8
        upconv4 = UpConv(nf // 2, dtype=dt, use_bias=bias, name="upconv4")(iconv5)
        upconv4 = bn("bn4")(upconv4, train=train)
        concat4 = jnp.concatenate([upconv4, skip2], axis=-1)
        iconv4 = nn.elu(
            Conv(nf // 2, (3, 3), padding=1, use_bias=bias, dtype=dt, name="conv4")(concat4)
        )
        iconv4 = bn("bn4_2")(iconv4, train=train)

        # Dense-ASPP cascade (rates 3/6/12/18/24), each atrous conv consuming
        # the concat of everything before it (pytorch/bts.py:210-220).
        daspp_3 = AtrousConv(
            nf // 4, 3, apply_bn_first=False, dtype=dt, tf_variant=tf_mode, name="daspp_3"
        )(iconv4, train=train)
        concat4_2 = jnp.concatenate([concat4, daspp_3], axis=-1)
        daspp_6 = AtrousConv(nf // 4, 6, dtype=dt, tf_variant=tf_mode, name="daspp_6")(
            concat4_2, train=train
        )
        concat4_3 = jnp.concatenate([concat4_2, daspp_6], axis=-1)
        daspp_12 = AtrousConv(nf // 4, 12, dtype=dt, tf_variant=tf_mode, name="daspp_12")(
            concat4_3, train=train
        )
        concat4_4 = jnp.concatenate([concat4_3, daspp_12], axis=-1)
        daspp_18 = AtrousConv(nf // 4, 18, dtype=dt, tf_variant=tf_mode, name="daspp_18")(
            concat4_4, train=train
        )
        concat4_5 = jnp.concatenate([concat4_4, daspp_18], axis=-1)
        daspp_24 = AtrousConv(nf // 4, 24, dtype=dt, tf_variant=tf_mode, name="daspp_24")(
            concat4_5, train=train
        )
        concat4_daspp = jnp.concatenate(
            [iconv4, daspp_3, daspp_6, daspp_12, daspp_18, daspp_24], axis=-1
        )
        daspp_feat = nn.elu(
            Conv(
                nf // 4, (3, 3), padding=1, use_bias=bias, dtype=dt, name="daspp_conv"
            )(concat4_daspp)
        )

        # 8x8 plane head + LPG (full resolution)
        # LPG plane decode stays f32 (trig on low-res tensors, cheap); the
        # full-res depth maps are produced directly in the compute dtype so
        # no conversion copies materialize at 128-lane-padded C=1 layouts.
        plane_eq_8x8 = reduc(nf // 4, name="reduc8x8")(daspp_feat)
        plane_eq_8x8 = normalize_plane(plane_eq_8x8)
        if tf_mode:
            # TF downsamples the materialized full-res map on the
            # align_corners grid (tensorflow/bts.py:66-73,281).
            depth_8x8 = local_planar_guidance(plane_eq_8x8, 8, impl=self.lpg_impl)
            depth_8x8_scaled = (depth_8x8 / self.max_depth).astype(dt)[..., None]
            depth_8x8_scaled_ds = downsample_nearest_ac(depth_8x8_scaled, 4)
        else:
            # The downsampled guidance map is sampled directly from the plane
            # equation (== nearest-downsample of the full-res LPG map) so the
            # full-resolution map need not exist at this point.
            depth_8x8_scaled = None
            depth_8x8_scaled_ds = (
                lpg_expand(plane_eq_8x8, 8, e=2, base=0, step=4) / self.max_depth
            ).astype(dt)[..., None]

        # H/4
        upconv3 = UpConv(nf // 4, dtype=dt, use_bias=bias, name="upconv3")(daspp_feat)
        upconv3 = bn("bn3")(upconv3, train=train)
        if tf_mode:
            iconv3 = nn.elu(
                Conv(nf // 4, (3, 3), padding=1, use_bias=True, dtype=dt, name="conv3")(
                    jnp.concatenate(
                        [upconv3, skip1, depth_8x8_scaled_ds.astype(dt)], axis=-1
                    )
                )
            )
        else:
            iconv3 = nn.elu(
                SplitConv(nf // 4, (3, 3), padding=1, dtype=dt, name="conv3")(
                    [upconv3, skip1, depth_8x8_scaled_ds.astype(dt)]
                )
            )

        plane_eq_4x4 = reduc(nf // 8, name="reduc4x4")(iconv3)
        plane_eq_4x4 = normalize_plane(plane_eq_4x4)
        if tf_mode:
            depth_4x4 = local_planar_guidance(plane_eq_4x4, 4, impl=self.lpg_impl)
            depth_4x4_scaled = (depth_4x4 / self.max_depth).astype(dt)[..., None]
            depth_4x4_scaled_ds = downsample_nearest_ac(depth_4x4_scaled, 2)
        else:
            depth_4x4_scaled = None
            depth_4x4_scaled_ds = (
                lpg_expand(plane_eq_4x4, 4, e=2, base=0, step=2) / self.max_depth
            ).astype(dt)[..., None]

        # H/2
        upconv2 = UpConv(nf // 8, dtype=dt, use_bias=bias, name="upconv2")(iconv3)
        upconv2 = bn("bn2")(upconv2, train=train)
        if tf_mode:
            iconv2 = nn.elu(
                Conv(nf // 8, (3, 3), padding=1, use_bias=True, dtype=dt, name="conv2")(
                    jnp.concatenate(
                        [upconv2, skip0, depth_4x4_scaled_ds.astype(dt)], axis=-1
                    )
                )
            )
        else:
            iconv2 = nn.elu(
                SplitConv(nf // 8, (3, 3), padding=1, dtype=dt, name="conv2")(
                    [upconv2, skip0, depth_4x4_scaled_ds.astype(dt)]
                )
            )

        plane_eq_2x2 = reduc(nf // 16, name="reduc2x2")(iconv2)
        plane_eq_2x2 = normalize_plane(plane_eq_2x2)

        # ---- Full-resolution tail ----
        if self.fast_tail and not tf_mode:
            return self._fast_tail(
                iconv2, plane_eq_2x2, plane_eq_4x4, plane_eq_8x8, focal
            )

        if depth_8x8_scaled is None:
            depth_8x8 = local_planar_guidance(plane_eq_8x8, 8, impl=self.lpg_impl)
            depth_8x8_scaled = (depth_8x8 / self.max_depth).astype(dt)[..., None]
        if depth_4x4_scaled is None:
            depth_4x4 = local_planar_guidance(plane_eq_4x4, 4, impl=self.lpg_impl)
            depth_4x4_scaled = (depth_4x4 / self.max_depth).astype(dt)[..., None]
        depth_2x2 = local_planar_guidance(plane_eq_2x2, 2, impl=self.lpg_impl)
        depth_2x2_scaled = (depth_2x2 / self.max_depth).astype(dt)[..., None]

        upconv1 = UpConv(nf // 16, dtype=dt, use_bias=bias, name="upconv1")(iconv2)
        # TF passes the full current width into the final reduction
        # (tensorflow/bts.py:316), giving one extra leading conv vs PT's
        # nf//32 start (pytorch/bts.py:190).
        reduc1x1 = reduc(
            nf // 16 if tf_mode else nf // 32, is_final=True, name="reduc1x1"
        )(upconv1)
        if tf_mode:
            iconv1 = nn.elu(
                Conv(nf // 16, (3, 3), padding=1, use_bias=True, dtype=dt, name="conv1")(
                    jnp.concatenate(
                        [
                            upconv1,
                            reduc1x1.astype(dt),
                            depth_2x2_scaled,
                            depth_4x4_scaled,
                            depth_8x8_scaled,
                        ],
                        axis=-1,
                    )
                )
            )
        else:
            # SplitConv == Conv(concat(...)) exactly, without materializing
            # the lane-padded C=1 concat (see layers.SplitConv docstring).
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
        depth_logits = Conv(
            1, (3, 3), padding=1, use_bias=bias, dtype=dt, name="get_depth"
        )(iconv1)
        final_depth = self.max_depth * jax.nn.sigmoid(
            depth_logits.astype(jnp.float32)
        )
        final_depth = self._focal_scale(final_depth, focal)

        return (
            depth_8x8_scaled.astype(jnp.float32),
            depth_4x4_scaled.astype(jnp.float32),
            depth_2x2_scaled.astype(jnp.float32),
            reduc1x1.astype(jnp.float32),
            final_depth,
        )

    def _focal_scale(self, final_depth, focal):
        if self.dataset == "kitti":
            # KITTI focal scaling (pytorch/bts.py:263-264).
            final_depth = final_depth * (
                focal.astype(jnp.float32)[:, None, None, None] / 715.0873
            )
        return final_depth

    def _fast_tail(
        self, iconv2, plane_eq_2x2, plane_eq_4x4, plane_eq_8x8, focal
    ):
        """Space-to-depth decoder tail — exact math, 4x channel packing.

        The reference tail (pytorch/bts.py:258-262) runs 3x3/1x1 convs on
        32-channel full-resolution tensors; on TPU a (8,128)-tiled
        channel-minor layout then uses <=25% of each tile. Here the whole
        tail runs in the H/2 domain with 2x2 phase blocks as channels
        (32 -> 128, full tiles):

          * upconv1: the fused lhs-dilated conv decomposes per output phase
            into four 2x2 convs (exactly the 4 non-zero taps each phase sees);
          * reduc1x1: 1x1 convs act per-phase -> grouped convs (groups=4);
          * LPG maps: evaluated directly in phase form (ops.lpg.lpg_s2d);
          * conv1/get_depth: 3x3 convs become 3x3 s2d-domain convs with the
            kernel transform _s2d_conv3_kernel (same receptive field);
          * depth_to_space only on the final 4-channel outputs.

        Identical parameters and numerics (mod float reassociation) to the
        plain tail — verified against the reference oracle in
        tests/test_decoder_parity.py.
        """
        nf = self.num_features
        dt = self.dtype
        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(dt) == jnp.float32
            else None
        )
        co = nf // 16  # 32

        # upconv1 in phase form: (B, H/2, W/2, 4*co)
        k_up = _NamedConvKernel((3, 3, iconv2.shape[-1], co), name="upconv1")()
        k_up = k_up.astype(dt)
        comp = jnp.zeros((4, 4, iconv2.shape[-1], co), dt)
        for a in (0, 1):
            for b in (0, 1):
                comp = comp.at[a : a + 3, b : b + 3].add(k_up)
        x = iconv2.astype(dt)
        if jnp.dtype(dt) == jnp.bfloat16:
            # All four phase convs as ONE 3x3 VALID conv on a pad-1 input
            # with a phase-structured (3,3,Ci,4co) kernel. The separate
            # 2x2 convs emit 32-channel outputs that XLA lays out
            # batch-minor (lanes=batch, 50% lane use at b64) and that
            # layout cascades through the whole tail; the fused form is a
            # single full-width MXU pass (profiled 18ms -> ~4ms at
            # 480x640 b64). Exact math: phase (a,b) output(i,j) =
            # sum_{q-a,r-b in {0,1}} comp[2q-a, 2r-b] . x[i+q-1, j+r-1],
            # zeros elsewhere.
            ci = iconv2.shape[-1]
            kphase = jnp.zeros((3, 3, ci, 4 * co), dt)
            for a in (0, 1):
                for b in (0, 1):
                    p = 2 * a + b
                    for q in range(3):
                        if not 0 <= q - a <= 1:
                            continue
                        for r_ in range(3):
                            if not 0 <= r_ - b <= 1:
                                continue
                            kphase = kphase.at[
                                q, r_, :, p * co : (p + 1) * co
                            ].set(comp[2 * q - a, 2 * r_ - b])
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            up1 = nn.elu(
                _conv(xp, kphase, ((0, 0), (0, 0)), precision)
            )
        else:
            phases = []
            for a in (0, 1):
                for b in (0, 1):
                    phases.append(
                        _conv(
                            x,
                            comp[a::2, b::2],
                            ((1 - a, a), (1 - b, b)),
                            precision,
                        )
                    )
            up1 = nn.elu(jnp.concatenate(phases, axis=-1))

        # reduc1x1 chain as grouped per-phase 1x1 convs.
        reduc_kernels = _FastReducParams(
            num_in=co, num_out=nf // 32, name="reduc1x1"
        )()
        y = up1
        for k in reduc_kernels[:-1]:
            y = nn.elu(_grouped_1x1(y, k.astype(dt), 4, precision))
        reduc_s2d = jax.nn.sigmoid(
            _grouped_1x1(y, reduc_kernels[-1].astype(dt), 4, precision)
        )

        # LPG maps in phase form, scaled.
        d8_s2d = (lpg_s2d(plane_eq_8x8, 8) / self.max_depth).astype(dt)
        d4_s2d = (lpg_s2d(plane_eq_4x4, 4) / self.max_depth).astype(dt)
        d2_s2d = (lpg_s2d(plane_eq_2x2, 2) / self.max_depth).astype(dt)

        # conv1: split over [upconv1 | reduc1x1, d2, d4, d8] with the
        # s2d-transformed kernel slices.
        k1 = _NamedConvKernel((3, 3, co + 4, co), name="conv1")().astype(dt)
        k1_main = _s2d_conv3_kernel(k1[:, :, :co, :])
        k1_aux = _s2d_conv3_kernel(k1[:, :, co:, :])
        # Aux input in phase-major blocks: [phase, (reduc, d2, d4, d8)].
        aux = jnp.stack([reduc_s2d, d2_s2d, d4_s2d, d8_s2d], axis=-1)
        aux = aux.reshape(*aux.shape[:3], 16)
        # One conv over the channel concat instead of summing two convs:
        # the separate aux conv (16-wide contraction) profiled 7.5 ms at
        # 480x640 b64 vs ~3.4 ms of concat traffic (this also mirrors the
        # reference's cat-then-conv1, pytorch/bts.py:258-259).
        k1_cat = jnp.concatenate([k1_main, k1_aux], axis=2)
        iconv1 = nn.elu(
            _conv(
                jnp.concatenate([up1, aux], axis=-1),
                k1_cat,
                ((1, 1), (1, 1)),
                precision,
            )
        )

        # get_depth in phase form, then a single depth_to_space.
        kd = _NamedConvKernel((3, 3, co, 1), name="get_depth")().astype(dt)
        kd_s2d = _s2d_conv3_kernel(kd)  # (3, 3, 4*co, 4)
        # The 4-wide output is NOT padded to lane width: XLA fuses this
        # conv into the k1_main conv's fusion where it is nearly free
        # (measured; a padded-kernel + optimization_barrier variant was
        # 5 img/s slower at 480x640 b64 because the barrier forced an
        # extra 128-wide materialization).
        logits = _conv(iconv1, kd_s2d, ((1, 1), (1, 1)), precision)
        depth_s2d = self.max_depth * jax.nn.sigmoid(
            logits.astype(jnp.float32)
        )
        final_depth = self._focal_scale(
            depth_to_space_phases(depth_s2d), focal
        )

        to_full = lambda m: depth_to_space_phases(m.astype(jnp.float32))
        return (
            to_full(d8_s2d),
            to_full(d4_s2d),
            to_full(d2_s2d),
            to_full(reduc_s2d),
            final_depth,
        )
