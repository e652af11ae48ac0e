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

from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

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
        # Tag conv outputs for the 'conv' remat policy (models/bts.py):
        # under nn.remat(policy=save_only_these_names('conv_out')) only
        # these tensors are saved for the backward; the elementwise
        # BN/ReLU chains between convs are recomputed (they fuse into the
        # backward's cotangent convs, so the recompute is ~free while the
        # saved residual traffic halves). A no-op outside remat scopes.
        tag = lambda y: checkpoint_name(y, "conv_out")
        cg = x.shape[-1] // self.groups
        if (
            self.groups > 1
            and cg == 1
            and self.features == self.groups
            and self.dilation == 1
            and not self.use_bias
            and jnp.dtype(self.dtype) == jnp.bfloat16
        ):
            # Depthwise convs (MobileNetV2): XLA:TPU's grouped lowering is
            # the known-slow path; a sum of kh*kw shifted elementwise FMAs
            # compiles to one VPU fusion reading the input once per tile —
            # measured 1.9x end-to-end on MobileNetV2 inference. Identical
            # math (each tap contributes w[dy,dx,c] * x[...]); param stays
            # in nn.Conv's grouped (kh, kw, 1, C) shape.
            return tag(_ShiftDepthwiseConv(
                kernel_size=self.kernel_size,
                strides=self.strides,
                padding=self.padding,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                name="conv",
            )(x))
        if (
            self.groups > 1
            and cg >= 4
            and not self.use_bias
            and jnp.dtype(self.dtype) == jnp.bfloat16
        ):
            # ResNeXt-style grouped convs (32 groups x 4-64 channels) waste
            # the 128-wide MXU contraction; a DENSE conv with the grouped
            # kernel embedded block-diagonally runs 1.6-2.9x faster on TPU
            # despite G x more (mostly-zero) FLOPs. Identical math; the
            # param stays in the grouped (kh,kw,Cg,O) shape so checkpoints
            # and the torch converter are unaffected. Depthwise (Cg<4)
            # stays grouped — there the FLOP blowup would dominate.
            return tag(_BlockDiagGroupedConv(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                padding=self.padding,
                dilation=self.dilation,
                groups=self.groups,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                name="conv",
            )(x))
        return tag(nn.Conv(
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
        )(x))


class _BlockDiagGroupedConv(nn.Module):
    """Grouped conv as dense conv(s) with block-diagonal kernels.

    The MXU contracts 128 lanes regardless of the conv's channel count, so
    a G-group conv with tiny per-group widths wastes the array; embedding
    the grouped kernel block-diagonally into a dense conv trades (mostly
    zero) FLOPs for full-lane tiling. Fully dense costs G x the useful
    FLOPs; instead groups are packed into ~128-output-lane BLOCKS — p
    groups per block with p*og ~= 128 — and each block runs as its own
    dense conv on its input channel slice (slices land on lane-tile
    boundaries, so they are layout-free). Redundancy drops from G x to
    p x = ~128/og x: e.g. ResNeXt101-32x8d layer4 (og=64) runs 16 block
    convs at 2x redundancy instead of one dense conv at 32x.

    Param path/shape matches nn.Conv's grouped layout ('kernel',
    (kh, kw, C/g, O)) exactly.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Union[int, Tuple[int, int]]
    dilation: int
    groups: int
    dtype: Dtype
    kernel_init: Any

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cg = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, cg, self.features),
            jnp.float32,
        ).astype(self.dtype)
        og = self.features // self.groups
        # p groups per block, sized to fill the 128-wide output lane tile.
        p = max(1, min(self.groups, -(-128 // og)))
        n_blocks = -(-self.groups // p)
        x = x.astype(self.dtype)
        outs = []
        for b in range(n_blocks):
            g0, g1 = b * p, min((b + 1) * p, self.groups)
            pb = g1 - g0
            dense = jnp.zeros((kh, kw, cg * pb, og * pb), self.dtype)
            for j in range(pb):
                dense = dense.at[
                    :, :, j * cg : (j + 1) * cg, j * og : (j + 1) * og
                ].set(kernel[:, :, :, (g0 + j) * og : (g0 + j + 1) * og])
            outs.append(
                jax.lax.conv_general_dilated(
                    x[..., g0 * cg : g1 * cg],
                    dense,
                    window_strides=self.strides,
                    padding=_pad(self.padding),
                    rhs_dilation=(self.dilation, self.dilation),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        return outs[0] if n_blocks == 1 else jnp.concatenate(outs, axis=-1)


class _ShiftDepthwiseConv(nn.Module):
    """Depthwise conv as a sum of shifted elementwise multiplies.

    out[b, i, j, c] = sum_{dy,dx} w[dy, dx, 0, c]
                      * x_pad[b, i*sh + dy, j*sw + dx, c]

    Param path/shape matches nn.Conv's depthwise layout ('kernel',
    (kh, kw, 1, C)) exactly, so checkpoints and the torch converter are
    unaffected.
    """

    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Union[int, Tuple[int, int]]
    dtype: Dtype
    kernel_init: Any

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        c = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, 1, c), jnp.float32
        ).astype(self.dtype)
        (ph, _), (pw, _) = _pad(self.padding)
        sh, sw = self.strides
        x = x.astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        b, hp, wp, _ = xp.shape
        out_h = (hp - kh) // sh + 1
        out_w = (wp - kw) // sw + 1
        out = None
        for dy in range(kh):
            for dx in range(kw):
                tap = jax.lax.slice(
                    xp,
                    (0, dy, dx, 0),
                    (b, dy + (out_h - 1) * sh + 1, dx + (out_w - 1) * sw + 1, c),
                    (1, sh, sw, 1),
                )
                term = tap * kernel[dy, dx, 0]
                out = term if out is None else out + term
        return out


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm2d (affine, running stats).

    Shares the stats/normalization math with VirtualBatchNorm (one-part
    call), so both paths carry torch's exact running-update semantics —
    in particular the Bessel-corrected running variance (see
    _VirtualBNInner)."""

    torch_momentum: float = TORCH_BN_MOMENTUM_ENCODER
    epsilon: float = ENCODER_BN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _VirtualBNInner(
            x.shape[-1],
            1.0 - self.torch_momentum,
            self.epsilon,
            self.dtype,
            name="bn",
        )([x], train=train)[0]


class _VirtualBNInner(nn.Module):
    """nn.BatchNorm-equivalent over a *virtual concatenation* of parts.

    Same param/stat tree as nn.BatchNorm (scale/bias + mean/var, each
    (C_total,) f32); each part is normalized with its channel slice. The
    stats math follows flax nn.BatchNorm (f32 statistics, biased variance
    via mean-of-squares, running update ra = m*ra + (1-m)*batch, and
    normalization arithmetic performed in the compute dtype) with ONE
    torch-parity deviation: the running-variance update uses the
    Bessel-corrected (unbiased) batch variance, exactly as
    torch.nn.BatchNorm2d does (normalization itself stays biased, also
    as torch does). Pinned by tests/test_train_parity.py.
    """

    features: int
    momentum: float
    epsilon: float
    dtype: Dtype

    @nn.compact
    def __call__(self, parts, train: bool = False):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats",
            "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats",
            "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        if train:
            means, variances = [], []
            for p in parts:
                x32 = p.astype(jnp.float32)
                m = jnp.mean(x32, axis=(0, 1, 2))
                m2 = jnp.mean(x32 * x32, axis=(0, 1, 2))
                means.append(m)
                variances.append(m2 - m * m)
            mean = jnp.concatenate(means)
            var = jnp.concatenate(variances)
            if not self.is_initializing():
                # n is per-channel sample count; channel concat => all parts
                # share (B, H, W), so one static factor serves every slice.
                n = (
                    parts[0].shape[0] * parts[0].shape[1] * parts[0].shape[2]
                )
                bessel = float(n) / float(n - 1) if n > 1 else 1.0
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var * bessel
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        dt = self.dtype
        eps = jnp.asarray(self.epsilon, dt)
        out = []
        off = 0
        for p in parts:
            c = p.shape[-1]
            sl = slice(off, off + c)
            mul = scale[sl].astype(dt) * jax.lax.rsqrt(var[sl].astype(dt) + eps)
            out.append(
                (p.astype(dt) - mean[sl].astype(dt)) * mul
                + bias[sl].astype(dt)
            )
            off += c
        return out


class VirtualBatchNorm(nn.Module):
    """BatchNorm over a virtual concatenation: bn(concat(parts)) computed
    per part without materializing the concat (BN is per-channel, so the
    split is exact). Param tree identical to layers.BatchNorm."""

    features: int
    torch_momentum: float = TORCH_BN_MOMENTUM_ENCODER
    epsilon: float = ENCODER_BN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, parts, train: bool = False):
        return _VirtualBNInner(
            self.features,
            1.0 - self.torch_momentum,
            self.epsilon,
            self.dtype,
            name="bn",
        )(parts, train=train)


class _SplitConvInner(nn.Module):
    """Holds the kernel under the same path as nn.Conv ('kernel')."""

    features: int
    kernel_size: Tuple[int, int]
    total_in: int
    padding: Union[int, Tuple[int, int]]
    dtype: Dtype
    kernel_init: Any

    @nn.compact
    def __call__(self, parts):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, self.total_in, self.features),
            jnp.float32,
        ).astype(self.dtype)
        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.dtype(self.dtype) == jnp.float32
            else None
        )
        out = None
        offset = 0
        for p in parts:
            cin = p.shape[-1]
            ksl = kernel[:, :, offset : offset + cin, :]
            p = p.astype(self.dtype)
            # NOTE: a shift-multiply (VPU) formulation for tiny C_in was
            # tried and measured 3x SLOWER end-to-end: XLA materializes the
            # taps instead of fusing them. Plain convs win.
            y = jax.lax.conv_general_dilated(
                p,
                ksl,
                window_strides=(1, 1),
                padding=_pad(self.padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision,
            )
            out = y if out is None else out + y
            offset += cin
        return out


class SplitConv(nn.Module):
    """Conv over a *virtual concatenation* of inputs, computed as a sum of
    per-part convolutions — mathematically identical to
    Conv(concat(parts)) since convolution is linear in input channels.

    TPU rationale: concatenating single-channel full-resolution maps (the
    LPG depth maps into the final decoder conv, pytorch/bts.py:260) forces
    XLA to relayout each C=1 tensor into a 128-lane-padded channel-minor
    layout (a ~128x traffic blowup) plus a multi-MB concatenate. Splitting
    the conv keeps each map in its natural layout and removes the concat
    entirely. The param tree is identical to Conv (kernel under
    '<name>/conv/kernel' with the concatenated input width), so checkpoints
    and the torch converter are unaffected.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Union[int, Tuple[int, int]] = 1
    dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, parts):
        total_in = sum(p.shape[-1] for p in parts)
        return _SplitConvInner(
            features=self.features,
            kernel_size=self.kernel_size,
            total_in=total_in,
            padding=self.padding,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="conv",
        )(parts)


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


def _align_corners_indices(n_in: int, n_out: int):
    """TF1 resize_nearest_neighbor(align_corners=True) source indices:
    src_i = round(i * (n_in - 1) / (n_out - 1)) (legacy TF kernel)."""
    import numpy as np

    if n_out == 1:
        return np.zeros(1, np.int32)
    scale = (n_in - 1) / (n_out - 1)
    return np.floor(np.arange(n_out) * scale + 0.5).astype(np.int32)


def downsample_nearest_ac(x, inv_scale: int):
    """TF-graph nearest downsample (align_corners=True), NHWC.

    The TF reference decoder downsamples the scaled LPG maps with
    tf.image.resize_nearest_neighbor(..., align_corners=True)
    (tensorflow/bts.py:66-73,281,296) whose source grid differs from the
    uniform stride the PT reference uses — e.g. 16->4 picks rows
    [0, 5, 10, 15] instead of [0, 4, 8, 12]. Static gather (indices are
    trace-time numpy).

    Note the matching UPSAMPLE needs no twin: for exact 2x,
    align_corners=True nearest is element-for-element equal to the plain
    2x repeat (proved in tests/test_tf_flavor.py against the TF compat op),
    so upsample_nearest serves both flavors.
    """
    b, h, w, c = x.shape
    ih = _align_corners_indices(h, h // inv_scale)
    iw = _align_corners_indices(w, w // inv_scale)
    return x[:, ih][:, :, iw]
