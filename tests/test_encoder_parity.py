"""Encoder output parity vs independent torch oracles.

Each oracle is a compact torch implementation of the standard architecture
(DenseNet / ResNet-ResNeXt / MobileNetV2) whose state_dict keys match
torchvision's naming — the same naming the reference's encoder wrapper
exposes (pytorch/bts.py:273-301). Random weights flow through our converter
into the flax encoder; outputs of all five skip stages must match.

This pins down: conv/BN semantics per stage, stride placement (torchvision
puts the bottleneck stride on the 3x3 conv), skip harvesting points, and
the converter's key mapping against realistic names.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from bts_tpu.models.bts import ENCODERS
from bts_tpu.models.convert import convert_state_dict

pytestmark = pytest.mark.slow  # multi-minute: full-model builds / oracles / e2e

H, W = 64, 96


# --------------------------- torch oracles ---------------------------


class _DenseLayer(nn.Module):
    def __init__(self, c_in, growth):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(c_in)
        self.conv1 = nn.Conv2d(c_in, 4 * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(4 * growth)
        self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


def _densenet_oracle(block_config, growth, init_feat):
    feats = nn.Module()
    feats.conv0 = nn.Conv2d(3, init_feat, 7, stride=2, padding=3, bias=False)
    feats.norm0 = nn.BatchNorm2d(init_feat)
    c = init_feat
    for bi, n_layers in enumerate(block_config):
        block = nn.Module()
        for li in range(n_layers):
            block.add_module(f"denselayer{li + 1}", _DenseLayer(c, growth))
            c += growth
        feats.add_module(f"denseblock{bi + 1}", block)
        if bi != len(block_config) - 1:
            trans = nn.Module()
            trans.norm = nn.BatchNorm2d(c)
            trans.conv = nn.Conv2d(c, c // 2, 1, bias=False)
            feats.add_module(f"transition{bi + 1}", trans)
            c //= 2
    feats.norm5 = nn.BatchNorm2d(c)
    return feats


def _densenet_forward(f, x, block_config):
    skips = []
    x = torch.relu(f.norm0(f.conv0(x)))
    skips.append(x)
    x = torch.max_pool2d(x, 3, 2, 1)
    skips.append(x)
    for bi in range(len(block_config)):
        block = getattr(f, f"denseblock{bi + 1}")
        for li in range(block_config[bi]):
            x = getattr(block, f"denselayer{li + 1}")(x)
        if bi != len(block_config) - 1:
            t = getattr(f, f"transition{bi + 1}")
            x = torch.nn.functional.avg_pool2d(
                t.conv(torch.relu(t.norm(x))), 2, 2
            )
            if bi < 2:
                skips.append(x)
    skips.append(f.norm5(x))
    return skips


class _Bottleneck(nn.Module):
    def __init__(self, c_in, planes, stride, groups, base_width):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(c_in, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(
            width, width, 3, stride=stride, padding=1, groups=groups, bias=False
        )
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or c_in != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idt)


def _resnet_oracle(layer_config, groups=1, base_width=64):
    m = nn.Module()
    m.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    m.bn1 = nn.BatchNorm2d(64)
    c_in = 64
    for li, (blocks, planes) in enumerate(zip(layer_config, (64, 128, 256, 512))):
        stride = 1 if li == 0 else 2
        seq = nn.Sequential(
            *[
                _Bottleneck(
                    c_in if bi == 0 else planes * 4,
                    planes,
                    stride if bi == 0 else 1,
                    groups,
                    base_width,
                )
                for bi in range(blocks)
            ]
        )
        m.add_module(f"layer{li + 1}", seq)
        c_in = planes * 4
    return m


def _resnet_forward(m, x, layer_config):
    skips = []
    x = torch.relu(m.bn1(m.conv1(x)))
    skips.append(x)
    x = torch.max_pool2d(x, 3, 2, 1)
    for li in range(4):
        x = getattr(m, f"layer{li + 1}")(x)
        skips.append(x)
    return skips


def _cbr(c_in, c_out, k=3, stride=1, groups=1):
    return nn.Sequential(
        nn.Conv2d(c_in, c_out, k, stride, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(c_out),
        nn.ReLU6(inplace=False),
    )


class _InvertedResidual(nn.Module):
    def __init__(self, c_in, c_out, stride, expand):
        super().__init__()
        hidden = c_in * expand
        layers = []
        if expand != 1:
            layers.append(_cbr(c_in, hidden, k=1))
        layers.append(_cbr(hidden, hidden, k=3, stride=stride, groups=hidden))
        layers.append(nn.Conv2d(hidden, c_out, 1, bias=False))
        layers.append(nn.BatchNorm2d(c_out))
        self.conv = nn.Sequential(*layers)
        self.use_res = stride == 1 and c_in == c_out

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def _mobilenet_oracle():
    cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    features = nn.Sequential(OrderedDict([("0", _cbr(3, 32, stride=2))]))
    c_in, idx = 32, 0
    for t, c, n, s in cfg:
        for bi in range(n):
            idx += 1
            features.add_module(
                str(idx), _InvertedResidual(c_in, c, s if bi == 0 else 1, t)
            )
            c_in = c
    features.add_module(str(idx + 1), _cbr(c_in, 1280, k=1))
    return features


def _mobilenet_forward(f, x):
    skips = []
    for i, m in enumerate(f):
        x = m(x)
        if i in (1, 3, 6, 10, 18):
            skips.append(x)
    return skips


# --------------------------- the parity test ---------------------------


def _randomize(module, seed):
    torch.manual_seed(seed)
    state = module.state_dict()
    new = {}
    for k, v in state.items():
        if k.endswith("running_var"):
            new[k] = torch.rand_like(v) + 0.5
        elif k.endswith("running_mean"):
            new[k] = torch.randn_like(v) * 0.1
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            new[k] = torch.randn_like(v) * 0.05
    module.load_state_dict(new, strict=False)
    module.eval()
    return module


CASES = {
    "densenet121_bts": lambda: (
        _densenet_oracle((6, 12, 24, 16), 32, 64),
        lambda m, x: _densenet_forward(m, x, (6, 12, 24, 16)),
    ),
    # The flagship (growth 48, init 96, torchvision densenet161 config).
    "densenet161_bts": lambda: (
        _densenet_oracle((6, 12, 36, 24), 48, 96),
        lambda m, x: _densenet_forward(m, x, (6, 12, 36, 24)),
    ),
    "resnet50_bts": lambda: (
        _resnet_oracle((3, 4, 6, 3)),
        lambda m, x: _resnet_forward(m, x, (3, 4, 6, 3)),
    ),
    "resnet101_bts": lambda: (
        _resnet_oracle((3, 4, 23, 3)),
        lambda m, x: _resnet_forward(m, x, (3, 4, 23, 3)),
    ),
    "resnext50_bts": lambda: (
        _resnet_oracle((3, 4, 6, 3), groups=32, base_width=4),
        lambda m, x: _resnet_forward(m, x, (3, 4, 6, 3)),
    ),
    # torchvision resnext101_32x8d (groups 32, width 8) — the widest zoo
    # member; also exercises the 128-lane grouped-conv packing numerics.
    "resnext101_bts": lambda: (
        _resnet_oracle((3, 4, 23, 3), groups=32, base_width=8),
        lambda m, x: _resnet_forward(m, x, (3, 4, 23, 3)),
    ),
    "mobilenetv2_bts": lambda: (
        _mobilenet_oracle(),
        lambda m, x: _mobilenet_forward(m, x),
    ),
}


@pytest.mark.parametrize("name", list(CASES.keys()))
def test_encoder_matches_torch_oracle(name, rng):
    oracle, fwd = CASES[name]()
    oracle = _randomize(oracle, seed=0)

    x = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_skips = fwd(oracle, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_skips = [s.numpy().transpose(0, 2, 3, 1) for s in ref_skips]

    factory, channels = ENCODERS[name]
    enc = factory()
    variables = enc.init(jax.random.key(0), jnp.asarray(x), train=False)

    torch_state = {
        "module.encoder.base_model." + k: v.numpy()
        for k, v in oracle.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }
    params, stats = convert_state_dict(
        torch_state,
        {"encoder": variables["params"]},
        {"encoder": variables["batch_stats"]},
    )
    skips = enc.apply(
        {"params": params["encoder"], "batch_stats": stats["encoder"]},
        jnp.asarray(x),
        train=False,
    )
    assert len(skips) == len(ref_skips) == 5
    for i, (ours, theirs) in enumerate(zip(skips, ref_skips)):
        ours = np.asarray(ours)
        assert ours.shape == theirs.shape, (i, ours.shape, theirs.shape)
        np.testing.assert_allclose(
            ours, theirs, rtol=2e-3, atol=2e-4, err_msg=f"skip {i}"
        )
