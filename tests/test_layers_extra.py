"""Extra layer tests: fused upconv identity, SplitConv identity, remat,
bn_no_track_stats."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from bts_tpu.config import Config
from bts_tpu.models.decoder import UpConv
from bts_tpu.models.layers import Conv, SplitConv


def test_fused_upconv_equals_unfused(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
    fused = UpConv(features=24, fused=True)
    unfused = UpConv(features=24, fused=False)
    variables = fused.init(jax.random.key(0), x)
    got = fused.apply(variables, x)
    want = unfused.apply(variables, x)  # identical param tree
    assert got.shape == (2, 16, 24, 24)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_splitconv_equals_conv_on_concat(rng):
    parts = [
        jnp.asarray(rng.normal(size=(2, 8, 10, c)).astype(np.float32))
        for c in (16, 1, 1, 3)
    ]
    sc = SplitConv(features=8, kernel_size=(3, 3), padding=1)
    variables = sc.init(jax.random.key(0), parts)
    got = sc.apply(variables, parts)

    conv = Conv(8, (3, 3), padding=1)
    want = conv.apply(
        {"params": {"conv": variables["params"]["conv"]}},
        jnp.concatenate(parts, axis=-1),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_blockdiag_grouped_conv_matches_grouped(rng):
    """bf16 grouped convs run as dense block-diagonal convs (TPU perf);
    must match the grouped path within bf16 tolerance, same param tree."""
    x = rng.normal(size=(2, 10, 12, 32)).astype(np.float32) * 0.1
    m_bf = Conv(32, (3, 3), padding=1, groups=4, dtype=jnp.bfloat16)
    m_f32 = Conv(32, (3, 3), padding=1, groups=4, dtype=jnp.float32)
    variables = m_bf.init(jax.random.key(0), jnp.asarray(x))
    assert set(variables["params"]["conv"].keys()) == {"kernel"}
    assert variables["params"]["conv"]["kernel"].shape == (3, 3, 8, 32)
    got = np.asarray(m_bf.apply(variables, jnp.asarray(x))).astype(np.float32)
    want = np.asarray(m_f32.apply(variables, jnp.asarray(x)))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.01, rel


def test_blockdiag_grouped_conv_multiblock(rng):
    """ResNeXt101-style wide grouped convs pack p=128/og groups per block
    and run several block convs (here og=16 -> p=8 -> 4 blocks); the math
    must still match the plain grouped conv, same param tree."""
    x = rng.normal(size=(2, 6, 8, 256)).astype(np.float32) * 0.1
    m_bf = Conv(512, (3, 3), padding=1, groups=32, dtype=jnp.bfloat16)
    m_f32 = Conv(512, (3, 3), padding=1, groups=32, dtype=jnp.float32)
    variables = m_bf.init(jax.random.key(0), jnp.asarray(x))
    assert variables["params"]["conv"]["kernel"].shape == (3, 3, 8, 512)
    got = np.asarray(m_bf.apply(variables, jnp.asarray(x))).astype(np.float32)
    want = np.asarray(m_f32.apply(variables, jnp.asarray(x)))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.01, rel
    # Stride-2 (ResNeXt downsample blocks).
    m_bf2 = Conv(
        512, (3, 3), strides=(2, 2), padding=1, groups=32, dtype=jnp.bfloat16
    )
    m_f322 = Conv(
        512, (3, 3), strides=(2, 2), padding=1, groups=32, dtype=jnp.float32
    )
    got = np.asarray(m_bf2.apply(variables, jnp.asarray(x))).astype(np.float32)
    want = np.asarray(m_f322.apply(variables, jnp.asarray(x)))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.01, rel


def test_depthwise_shift_matches_grouped(rng):
    """bf16 depthwise convs run as kh*kw shifted elementwise FMAs (the
    grouped XLA:TPU lowering is the known-slow path); must match the f32
    grouped path within bf16 tolerance with the identical param tree,
    for both strides MobileNetV2 uses."""
    for stride, hw in ((1, (9, 11)), (2, (10, 12))):
        x = rng.normal(size=(2, *hw, 16)).astype(np.float32) * 0.1
        m_bf = Conv(
            16, (3, 3), strides=(stride, stride), padding=1, groups=16,
            dtype=jnp.bfloat16,
        )
        m_f32 = Conv(
            16, (3, 3), strides=(stride, stride), padding=1, groups=16,
            dtype=jnp.float32,
        )
        variables = m_bf.init(jax.random.key(0), jnp.asarray(x))
        assert variables["params"]["conv"]["kernel"].shape == (3, 3, 1, 16)
        got = np.asarray(m_bf.apply(variables, jnp.asarray(x))).astype(
            np.float32
        )
        want = np.asarray(m_f32.apply(variables, jnp.asarray(x)))
        assert got.shape == want.shape
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 0.02, (stride, rel)


@pytest.mark.slow
@pytest.mark.parametrize(
    "policy,scope",
    [("conv", "encoder"), ("full", "encoder"), ("full", "all")],
)
def test_remat_model_matches_plain(policy, scope):
    from bts_tpu.models.bts import BTSModel, init_model

    kwargs = dict(encoder_name="mobilenetv2_bts", max_depth=10.0)
    plain = BTSModel(**kwargs, remat=False)
    remat = BTSModel(**kwargs, remat=True, remat_policy=policy, remat_scope=scope)
    params, stats = init_model(plain, jax.random.key(0), (1, 64, 96, 3))
    x = jax.random.normal(jax.random.key(1), (1, 64, 96, 3))
    focal = jnp.array([518.8579])
    v = {"params": params, "batch_stats": stats}
    out_p = plain.apply(v, x, focal, train=False)[4]
    out_r = remat.apply(v, x, focal, train=False)[4]
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), rtol=1e-6)

    # Gradients flow through the remat path.
    def loss(p):
        return jnp.sum(
            remat.apply({"params": p, "batch_stats": stats}, x, focal,
                        train=False)[4]
        )

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


@pytest.mark.slow
def test_bn_no_track_stats_train_step(rng):
    """bn_no_track_stats: BN uses running stats during training and the
    stats are not updated (reference bn_init_as_tf, pytorch/bts.py:26-31)."""
    from bts_tpu.models.bts import create_model, init_model
    from bts_tpu.training.optim import create_optimizer
    from bts_tpu.training.state import create_train_state, make_train_step

    cfg = Config(
        encoder="mobilenetv2_bts",
        dataset="nyu",
        max_depth=10.0,
        batch_size=2,
        bn_no_track_stats=True,
    )
    model = create_model(cfg)
    params, stats = init_model(model, jax.random.key(0), (2, 64, 96, 3))
    tx, _ = create_optimizer(cfg, params, 100)
    state = create_train_state(params, stats, tx)
    step = make_train_step(model, tx, cfg)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32)),
        "depth": jnp.asarray(
            rng.uniform(0.5, 9.5, size=(2, 64, 96, 1)).astype(np.float32)
        ),
        "focal": jnp.full((2,), 518.8579, jnp.float32),
    }
    new_state, metrics = jax.jit(step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # batch_stats unchanged
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
