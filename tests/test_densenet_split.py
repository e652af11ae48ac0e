"""Virtual-concat dense block (split mode) vs the plain concat path.

The split path (VirtualBatchNorm + SplitConv, no materialized concats)
must produce the same skips, the same batch-stats updates, and the
identical parameter tree as the reference-exact concat path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.models.encoders.densenet import DenseNetEncoder

pytestmark = pytest.mark.slow  # multi-minute: full-model builds / oracles / e2e


def _tiny(split):
    return DenseNetEncoder(
        block_config=(2, 3, 6, 2),
        growth_rate=8,
        num_init_features=16,
        dtype=jnp.float32,
        split=split,
    )


@pytest.fixture(scope="module")
def setup(rng_module):
    x = jnp.asarray(
        rng_module.normal(size=(2, 32, 48, 3)).astype(np.float32)
    )
    plain = _tiny(False)
    splitm = _tiny(True)
    variables = plain.init(jax.random.key(0), x, train=False)
    return x, plain, splitm, variables


def test_param_trees_identical(setup):
    x, plain, splitm, variables = setup
    v2 = splitm.init(jax.random.key(0), x, train=False)
    p1 = jax.tree.map(lambda a: (a.shape), variables)
    p2 = jax.tree.map(lambda a: (a.shape), v2)
    assert p1 == p2


def test_split_matches_plain_eval(setup):
    x, plain, splitm, variables = setup
    out_p = plain.apply(variables, x, train=False)
    out_s = splitm.apply(variables, x, train=False)
    assert len(out_p) == len(out_s) == 5
    for a, b in zip(out_p, out_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_split_matches_plain_train_stats(setup):
    x, plain, splitm, variables = setup
    out_p, upd_p = plain.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    out_s, upd_s = splitm.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    for a, b in zip(out_p, out_s):
        # Train-mode BN divides by batch stddev; for near-constant channels
        # (random init) that amplifies f32 reduction reassociation, so the
        # output tolerance is looser than eval mode. The stats themselves
        # (below) stay tight.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )
    flat_p = jax.tree.leaves_with_path(upd_p["batch_stats"])
    flat_s = dict(jax.tree.leaves_with_path(upd_s["batch_stats"]))
    assert len(flat_p) == len(flat_s)
    for path, val in flat_p:
        np.testing.assert_allclose(
            np.asarray(val),
            np.asarray(flat_s[path]),
            rtol=2e-5,
            atol=2e-5,
            err_msg=str(path),
        )


def test_split_gradients_flow(setup):
    x, plain, splitm, variables = setup

    def loss(params, model):
        outs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=False,
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    g_p = jax.grad(loss)(variables["params"], plain)
    g_s = jax.grad(loss)(variables["params"], splitm)
    for (path, a), (_, b) in zip(
        jax.tree.leaves_with_path(g_p), jax.tree.leaves_with_path(g_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b),
            rtol=5e-4,
            atol=5e-4,
            err_msg=str(path),
        )


def test_buffer_mode_matches_concat(setup):
    """In-place dus-buffer block (bf16-eval layout mode) == concat chain."""
    from bts_tpu.models.encoders.densenet import DenseBlock

    x, plain, splitm, variables = setup
    rng = np.random.default_rng(7)
    xb = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
    block = DenseBlock(3, 8, dtype=jnp.float32)
    bufblock = DenseBlock(3, 8, dtype=jnp.float32, buffer=True)
    v = block.init(jax.random.key(1), xb, train=False)
    out_c = block.apply(v, xb, train=False)
    out_b = bufblock.apply(v, xb, train=False)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(out_b), rtol=1e-6, atol=1e-6
    )
