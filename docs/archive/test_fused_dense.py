"""ARCHIVED (round 5) with ops/fused_dense.py — restore both to their
original paths (bts_tpu/ops/, tests/) to re-run. See docs/DESIGN.md
"Fused dense-layer Pallas kernel: a measured dead end".

Fused dense-layer Pallas kernel vs the XLA chain (interpreter on CPU).

The kernel is a documented negative result on v5e (docs/DESIGN.md,
"Fused dense-layer Pallas kernel: a measured dead end") but is kept
correct: these tests pin both variants to the unfused
BN-ReLU-1x1-BN-ReLU-3x3 chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.ops.fused_dense import (
    fold_bn,
    fused_dense_layer,
    fused_dense_layer_eo,
    pack_w2_eo,
)


def _xla_chain(x, s1, b1, w1, s2, b2, w2):
    dt = x.dtype
    y = jnp.maximum(x * s1.astype(dt) + b1.astype(dt), 0)
    t = jax.lax.conv_general_dilated(
        y, w1[None, None].astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    z = jnp.maximum(t * s2.astype(dt) + b2.astype(dt), 0)
    return jax.lax.conv_general_dilated(
        z, w2.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.fixture
def layer(rng):
    b, h, w, c, cmid, g = 2, 8, 12, 40, 24, 8
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    gam1 = jnp.asarray(rng.normal(size=c).astype(np.float32))
    bet1 = jnp.asarray(rng.normal(size=c).astype(np.float32))
    mean1 = jnp.asarray(rng.normal(size=c).astype(np.float32))
    var1 = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    gam2 = jnp.asarray(rng.normal(size=cmid).astype(np.float32))
    bet2 = jnp.asarray(rng.normal(size=cmid).astype(np.float32))
    mean2 = jnp.asarray(rng.normal(size=cmid).astype(np.float32))
    var2 = jnp.asarray(rng.uniform(0.5, 2.0, cmid).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(c, cmid)) * 0.1).astype(np.float32))
    w2 = jnp.asarray(
        (rng.normal(size=(3, 3, cmid, g)) * 0.1).astype(np.float32)
    )
    s1, b1_ = fold_bn(gam1, bet1, mean1, var1, 1e-5)
    s2, b2_ = fold_bn(gam2, bet2, mean2, var2, 1e-5)
    return x, s1, b1_, w1, s2, b2_, w2


def test_fold_bn_matches_batchnorm(rng):
    c = 7
    x = jnp.asarray(rng.normal(size=(3, 4, 5, c)).astype(np.float32))
    gam = jnp.asarray(rng.normal(size=c).astype(np.float32))
    bet = jnp.asarray(rng.normal(size=c).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=c).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    eps = 1e-5
    want = (x - mean) * jax.lax.rsqrt(var + eps) * gam + bet
    s, b = fold_bn(gam, bet, mean, var, eps)
    np.testing.assert_allclose(
        np.asarray(x * s + b), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_taps_matches_xla_chain(layer):
    x, s1, b1, w1, s2, b2, w2 = layer
    want = np.asarray(_xla_chain(x, s1, b1, w1, s2, b2, w2))
    got = np.asarray(
        fused_dense_layer(x, s1, b1, w1, s2, b2, w2, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_eo_matches_xla_chain(layer):
    x, s1, b1, w1, s2, b2, w2 = layer
    want = np.asarray(_xla_chain(x, s1, b1, w1, s2, b2, w2))
    xe, xo = x[:, :, 0::2, :], x[:, :, 1::2, :]
    w2q = pack_w2_eo(w2)
    out = fused_dense_layer_eo(
        xe, xo, s1, b1, w1, s2, b2, w2q, interpret=True
    )
    b, h, u, g2 = out.shape
    g = g2 // 2
    got = np.asarray(out.reshape(b, h, u, 2, g).reshape(b, h, 2 * u, g))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
