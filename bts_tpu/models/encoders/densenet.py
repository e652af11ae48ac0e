"""DenseNet-121/161 encoders (NHWC flax), skip harvesting per the reference.

Architecture follows the standard torchvision DenseNet (Huang et al. 2017),
which is what the reference wraps (pytorch/bts.py:273-280): conv7x7/2 ->
BN -> ReLU [skip0] -> maxpool3x3/2 [skip1] -> denseblock1 -> transition1
[skip2] -> denseblock2 -> transition2 [skip3] -> denseblock3 -> transition3
-> denseblock4 -> norm5 [final, pre-ReLU]. The TF twin hand-builds the same
graph (tensorflow/bts.py:105-235).

feat_out_channels: densenet121 [64,64,128,256,1024];
densenet161 [96,96,192,384,2208] (pytorch/bts.py:276,280).

TPU note — the virtual-concat dense block (bf16 default): torchvision's
dense layer concatenates ALL previous features before its bottleneck,
which on TPU materializes an O(L^2)-traffic chain of concatenates
(measured 23% of DenseNet161 inference device time). Because BatchNorm is
per-channel and a 1x1 conv is linear in input channels,
conv1x1(relu(bn(concat(parts)))) == sum_p conv1x1_p(relu(bn_p(part_p)))
exactly — so the block keeps a LIST of feature tensors and never
materializes the concatenation (VirtualBatchNorm + SplitConv, identical
param trees). Trailing parts are coalesced into growth_rate*CHUNK-channel
chunks so each per-part conv keeps an MXU-efficient contraction width.
f32 mode keeps the plain concat path for reference-exact accumulation
order; equivalence is pinned by tests/test_densenet_split.py.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bts_tpu.models.layers import (
    BatchNorm,
    Conv,
    SplitConv,
    VirtualBatchNorm,
)

Dtype = Any

# Coalesce this many trailing growth-rate parts into one chunk (keeps the
# per-part 1x1 convs at contraction width >= 128 for growth 32/48 while
# bounding the op count at ~7 parts per layer in the deepest block).
_CHUNK = 4

# Virtual-concat only pays off in DEEP blocks: measured on v5e, split mode
# cut block3 (36 layers, 30x40) by ~20% but slightly hurt the shallow
# high-res blocks (per-part 1x1 convs underutilize the MXU contraction at
# K=48..192 while the removed concats were cheap relative). Blocks below
# this layer count keep the plain concat path.
#
# The threshold is BATCH-dependent: at batch >= 128 XLA switches to
# batch-minor layouts (B fills the 128-lane tile exactly), narrow per-part
# convs stop wasting lanes, and splitting block2 (12 layers) measures
# +8% end-to-end (394 vs 363 img/s, DenseNet161 480x640 b128); at b64 the
# same split measured -2%. Splitting the 6-layer block1 loses at every
# batch size.
_SPLIT_MIN_LAYERS = 16
_SPLIT_MIN_LAYERS_B128 = 12


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF 'SAME' per-side padding for one spatial dim (extra pixel AFTER).

    slim/tf.nn SAME: out = ceil(size/s), total = max((out-1)*s + k - size, 0),
    split low = total//2 — asymmetric when total is odd (k7/s2 and k3/s2 on
    even inputs pad (2,3)/(0,1), vs torch's symmetric (3,3)/(1,1))."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    lo = total // 2
    return lo, total - lo


class DenseLayer(nn.Module):
    """BN -> ReLU -> 1x1 conv(4g) -> BN -> ReLU -> 3x3 conv(g).

    Takes the list of previous feature tensors (a virtual concatenation)
    and returns only the NEW growth_rate features; the block decides how
    to accumulate them.
    """

    growth_rate: int
    dtype: Dtype = jnp.float32
    # TF-flavor graphs use eps=1.1e-5 encoder-wide (tensorflow/bts.py:189).
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, parts, train: bool = False):
        total_in = sum(p.shape[-1] for p in parts)
        if len(parts) == 1:
            y = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="norm1")(
                parts[0], train=train
            )
            y = nn.relu(y)
            y = Conv(
                4 * self.growth_rate, (1, 1), dtype=self.dtype, name="conv1"
            )(y)
        else:
            ys = VirtualBatchNorm(
                total_in, epsilon=self.bn_eps, dtype=self.dtype, name="norm1"
            )(parts, train=train)
            y = SplitConv(
                4 * self.growth_rate,
                (1, 1),
                padding=0,
                dtype=self.dtype,
                name="conv1",
            )([nn.relu(p) for p in ys])
        y = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="norm2")(
            y, train=train
        )
        y = nn.relu(y)
        y = Conv(
            self.growth_rate, (3, 3), padding=1, dtype=self.dtype, name="conv2"
        )(y)
        return y


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    dtype: Dtype = jnp.float32
    bn_eps: float = 1e-5
    split: bool = False
    # 'buffer': carry the growing concatenation as ONE preallocated
    # (B, H, W, C_final) buffer — each layer reads the channel prefix and
    # dynamic-update-slices its growth_rate output in place. Identical
    # math to the concat chain (pure data movement), but XLA's buffer
    # assignment aliases the dus instead of rewriting a fresh growing
    # buffer per layer, cutting the block's concat traffic.
    buffer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Returns the block output as a tensor (split=False) or as the
        parts list of the virtual concatenation (split=True)."""
        if self.buffer and not self.split:
            c0 = x.shape[-1]
            grow = self.num_layers * self.growth_rate
            buf = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, grow)))
            c_now = c0
            for i in range(self.num_layers):
                prefix = jax.lax.slice_in_dim(buf, 0, c_now, axis=3)
                new = DenseLayer(
                    self.growth_rate,
                    dtype=self.dtype,
                    bn_eps=self.bn_eps,
                    name=f"denselayer{i + 1}",
                )([prefix], train=train)
                buf = jax.lax.dynamic_update_slice(
                    buf, new.astype(buf.dtype), (0, 0, 0, c_now)
                )
                c_now += self.growth_rate
            return buf
        parts = [x]
        tail = 0
        for i in range(self.num_layers):
            new = DenseLayer(
                self.growth_rate,
                dtype=self.dtype,
                bn_eps=self.bn_eps,
                name=f"denselayer{i + 1}",
            )(parts, train=train)
            if self.split:
                parts.append(new)
                tail += 1
                if tail == _CHUNK:
                    parts = parts[:-tail] + [
                        jnp.concatenate(parts[-tail:], axis=-1)
                    ]
                    tail = 0
            else:
                parts = [jnp.concatenate([parts[0], new], axis=-1)]
        return parts if self.split else parts[0]


class Transition(nn.Module):
    """BN -> ReLU -> 1x1 conv(C/2) -> avgpool 2x2/2. Accepts a tensor or
    a parts list (virtual concatenation)."""

    out_features: int
    dtype: Dtype = jnp.float32
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        parts = x if isinstance(x, (list, tuple)) else [x]
        total_in = sum(p.shape[-1] for p in parts)
        if len(parts) == 1:
            y = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="norm")(
                parts[0], train=train
            )
            y = nn.relu(y)
            y = Conv(self.out_features, (1, 1), dtype=self.dtype, name="conv")(
                y
            )
        else:
            ys = VirtualBatchNorm(
                total_in, epsilon=self.bn_eps, dtype=self.dtype, name="norm"
            )(parts, train=train)
            y = SplitConv(
                self.out_features,
                (1, 1),
                padding=0,
                dtype=self.dtype,
                name="conv",
            )([nn.relu(p) for p in ys])
        return nn.avg_pool(y, (2, 2), strides=(2, 2))


class DenseNetEncoder(nn.Module):
    """Returns the 5 BTS skip features (pytorch/bts.py:305-320).

    split='auto' enables the virtual-concat dense block in bf16 mode and
    keeps the reference-exact concat path in f32 (same convention as the
    other TPU layout transforms in this package).
    """

    block_config: Tuple[int, int, int, int]
    growth_rate: int
    num_init_features: int
    dtype: Dtype = jnp.float32
    # TF-flavor slim graphs build every encoder BN with eps=1.1e-5
    # (tensorflow/bts.py:189-193); torchvision uses 1e-5 (default).
    bn_eps: float = 1e-5
    # TF-flavor stem: slim 'SAME' padding for the k7/s2 conv and k3/s2
    # maxpool (tensorflow/bts.py:204-210) — asymmetric (2,3)/(0,1) on even
    # inputs, one input pixel off the torch grid. Everything downstream
    # (k3/s1 convs, 2x2/s2 VALID pools) pads identically in both flavors.
    tf_stem: bool = False
    split: Any = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # 'auto': bf16 inference only, deep blocks only (_SPLIT_MIN_LAYERS).
        # Train mode keeps the concat path: measured throughput-neutral
        # at train crop sizes (94.3 vs 94.4 ex/s DenseNet161 416x544 b16,
        # delay-1), so prefer the reference-exact accumulation order and
        # the simpler backward in the gradient path.
        # Explicit True/False forces every block (used by equivalence tests).
        auto = (
            self.split == "auto"
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and not train
        )
        forced = self.split is True
        min_layers = (
            _SPLIT_MIN_LAYERS_B128 if x.shape[0] >= 128 else _SPLIT_MIN_LAYERS
        )
        skips = []
        if self.tf_stem:
            x = jnp.pad(
                x,
                (
                    (0, 0),
                    _same_pads(x.shape[1], 7, 2),
                    _same_pads(x.shape[2], 7, 2),
                    (0, 0),
                ),
            )
        x = Conv(
            self.num_init_features,
            (7, 7),
            strides=(2, 2),
            padding=0 if self.tf_stem else 3,
            dtype=self.dtype,
            name="conv0",
        )(x)
        x = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="norm0")(
            x, train=train
        )
        x = nn.relu(x)
        skips.append(x)  # 'relu0' — H/2
        pool_pad = (
            (_same_pads(x.shape[1], 3, 2), _same_pads(x.shape[2], 3, 2))
            if self.tf_stem
            else ((1, 1), (1, 1))
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)
        skips.append(x)  # 'pool0' — H/4

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            do_split = forced or (auto and num_layers >= min_layers)
            x = DenseBlock(
                num_layers,
                self.growth_rate,
                dtype=self.dtype,
                bn_eps=self.bn_eps,
                split=do_split,
                # Shallow blocks (where split loses) still drop the
                # growing-concat rewrites via the in-place dus buffer.
                buffer=auto and not do_split,
                name=f"denseblock{i + 1}",
            )(x, train=train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features //= 2
                x = Transition(
                    num_features,
                    dtype=self.dtype,
                    bn_eps=self.bn_eps,
                    name=f"transition{i + 1}",
                )(x, train=train)
                if i < 2:
                    skips.append(x)  # 'transition1' H/8, 'transition2' H/16
        # norm5 — H/32, pre-ReLU (decoder applies ReLU). In split mode the
        # final concat happens exactly once, after the per-part BN.
        if isinstance(x, list):
            x = jnp.concatenate(
                VirtualBatchNorm(
                    sum(p.shape[-1] for p in x),
                    epsilon=self.bn_eps,
                    dtype=self.dtype,
                    name="norm5",
                )(x, train=train),
                axis=-1,
            )
        else:
            x = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="norm5")(
                x, train=train
            )
        skips.append(x)
        return skips


def densenet121(dtype=jnp.float32) -> DenseNetEncoder:
    return DenseNetEncoder((6, 12, 24, 16), 32, 64, dtype=dtype)


def densenet161(dtype=jnp.float32) -> DenseNetEncoder:
    return DenseNetEncoder((6, 12, 36, 24), 48, 96, dtype=dtype)
