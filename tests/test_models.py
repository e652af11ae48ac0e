"""Model tests: skip shapes/channels per encoder, decoder output contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: full-model builds / oracles / e2e

from bts_tpu.models.bts import BTSModel, ENCODERS, init_model
from bts_tpu.models.decoder import BTSDecoder, Reduction1x1, UpConv, AtrousConv

H, W = 64, 96  # small but divisible by 32


def _skip_shapes(channels):
    divs = [2, 4, 8, 16, 32]
    return [(1, H // d, W // d, c) for d, c in zip(divs, channels)]


@pytest.mark.parametrize("name", list(ENCODERS.keys()))
def test_encoder_skip_shapes(name):
    factory, channels = ENCODERS[name]
    enc = factory()
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = enc.init(jax.random.key(0), x, train=False)
    skips = enc.apply(variables, x, train=False)
    assert len(skips) == 5
    got = [tuple(s.shape) for s in skips]
    assert got == _skip_shapes(channels), f"{name}: {got}"


def test_decoder_outputs():
    channels = [64, 64, 128, 256, 1024]
    skips = [
        jnp.ones(s, jnp.float32) * 0.1 for s in _skip_shapes(channels)
    ]
    dec = BTSDecoder(max_depth=10.0, dataset="nyu", num_features=512)
    focal = jnp.array([518.8579])
    variables = dec.init(jax.random.key(0), skips, focal, train=False)
    lpg8, lpg4, lpg2, reduc1, depth = dec.apply(
        variables, skips, focal, train=False
    )
    for out in (lpg8, lpg4, lpg2, reduc1, depth):
        assert out.shape == (1, H, W, 1)
    d = np.asarray(depth)
    assert np.all(d > 0) and np.all(d <= 10.0)
    # LPG scaled maps are depth/max_depth.
    assert np.all(np.asarray(reduc1) >= 0) and np.all(np.asarray(reduc1) <= 1)


def test_kitti_focal_scaling():
    channels = [64, 64, 128, 256, 1024]
    skips = [jnp.ones(s, jnp.float32) * 0.1 for s in _skip_shapes(channels)]
    dec = BTSDecoder(max_depth=80.0, dataset="kitti", num_features=512)
    variables = dec.init(
        jax.random.key(0), skips, jnp.array([715.0873]), train=False
    )
    d1 = dec.apply(variables, skips, jnp.array([715.0873]), train=False)[4]
    d2 = dec.apply(variables, skips, jnp.array([2 * 715.0873]), train=False)[4]
    # final depth scales linearly with focal (pytorch/bts.py:263-264).
    np.testing.assert_allclose(np.asarray(d2), 2 * np.asarray(d1), rtol=1e-5)


def test_full_model_forward_and_param_count():
    model = BTSModel(
        encoder_name="densenet121_bts", max_depth=10.0, dataset="nyu"
    )
    params, batch_stats = init_model(model, jax.random.key(0), (1, H, W, 3))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    # Reference reports 21.2M params for DenseNet121-BTS (README.md:69).
    assert 20.5e6 < n_params < 22.0e6, n_params

    outs = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.zeros((1, H, W, 3)),
        jnp.array([518.8579]),
        train=False,
    )
    assert len(outs) == 5
    assert outs[4].shape == (1, H, W, 1)


def test_model_train_mode_updates_batch_stats():
    model = BTSModel(encoder_name="mobilenetv2_bts", max_depth=10.0)
    params, batch_stats = init_model(model, jax.random.key(0), (2, H, W, 3))
    x = jax.random.normal(jax.random.key(1), (2, H, W, 3))
    outs, updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        jnp.array([518.8579, 518.8579]),
        train=True,
        mutable=["batch_stats"],
    )
    # Running stats must change in train mode.
    before = jax.tree.leaves(batch_stats)
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )
    assert changed


def test_reduction1x1_chain_depth():
    """reduc8x8(128): 128->64->32->16->8->plane (pytorch/bts.py:91-108)."""
    m = Reduction1x1(num_out_filters=128, max_depth=10.0)
    x = jnp.zeros((1, 4, 4, 128))
    variables = m.init(jax.random.key(0), x)
    names = set(variables["params"].keys())
    assert names == {"inter_0", "inter_1", "inter_2", "inter_3", "inter_4",
                     "plane_params"}
    out = m.apply(variables, x)
    assert out.shape == (1, 4, 4, 4)

    mf = Reduction1x1(num_out_filters=16, max_depth=10.0, is_final=True)
    variables = mf.init(jax.random.key(0), jnp.zeros((1, 4, 4, 32)))
    assert set(variables["params"].keys()) == {"inter_0", "inter_1", "final"}
    out = mf.apply(variables, jnp.zeros((1, 4, 4, 32)))
    assert out.shape == (1, 4, 4, 1)


def test_upconv_doubles_resolution():
    m = UpConv(features=8)
    x = jnp.ones((1, 4, 6, 4))
    variables = m.init(jax.random.key(0), x)
    assert m.apply(variables, x).shape == (1, 8, 12, 8)


def test_atrous_conv_preserves_resolution():
    m = AtrousConv(features=8, dilation=6)
    x = jnp.ones((2, 16, 16, 12))
    variables = m.init(jax.random.key(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 16, 16, 8)
