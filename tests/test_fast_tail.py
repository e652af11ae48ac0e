"""Fast (space-to-depth) decoder tail == plain tail, exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.models.decoder import BTSDecoder
from bts_tpu.ops.lpg import (
    depth_to_space_phases,
    lpg_expand,
    lpg_reference,
    lpg_s2d,
)

H, W = 64, 96


def _rand_plane(rng, b, h, w):
    theta = rng.uniform(0.05, np.pi / 3, size=(b, h, w))
    phi = rng.uniform(0, 2 * np.pi, size=(b, h, w))
    dist = rng.uniform(0.5, 10.0, size=(b, h, w))
    return jnp.asarray(
        np.stack(
            [
                np.sin(theta) * np.cos(phi),
                np.sin(theta) * np.sin(phi),
                np.cos(theta),
                dist,
            ],
            -1,
        ).astype(np.float32)
    )

pytestmark = pytest.mark.slow  # multi-minute: full-model builds / oracles / e2e


@pytest.mark.parametrize("r", [2, 4, 8])
def test_lpg_s2d_equals_full(rng, r):
    pe = _rand_plane(rng, 2, 4, 6)
    full = np.asarray(lpg_reference(pe, r))
    s2d = np.asarray(depth_to_space_phases(lpg_s2d(pe, r)))[..., 0]
    np.testing.assert_allclose(s2d, full, rtol=1e-6)


@pytest.mark.parametrize("r,ds", [(8, 4), (4, 2)])
def test_lpg_expand_equals_downsample(rng, r, ds):
    pe = _rand_plane(rng, 1, 4, 6)
    full = np.asarray(lpg_reference(pe, r))
    got = np.asarray(lpg_expand(pe, r, e=2, base=0, step=r // 2))
    np.testing.assert_allclose(got, full[:, ::ds, ::ds], rtol=1e-6)


@pytest.mark.parametrize("nf", [512, 128])
def test_fast_tail_equals_plain_tail(rng, nf):
    # nf=128 is the documented minimum bts_size (create_model validation)
    # and the size the multichip dryrun + mesh canaries run at.
    channels = [64, 64, 128, 256, 1024]
    divs = [2, 4, 8, 16, 32]
    skips = [
        jnp.asarray(
            rng.normal(size=(2, H // d, W // d, c)).astype(np.float32) * 0.2
        )
        for d, c in zip(divs, channels)
    ]
    focal = jnp.array([718.856, 600.0])

    fast = BTSDecoder(
        max_depth=10.0, dataset="kitti", fast_tail=True, num_features=nf
    )
    slow = BTSDecoder(
        max_depth=10.0, dataset="kitti", fast_tail=False, num_features=nf
    )
    variables = fast.init(jax.random.key(0), skips, focal, train=False)
    # Same param tree for both tails.
    slow_vars = slow.init(jax.random.key(0), skips, focal, train=False)
    assert jax.tree.structure(variables["params"]) == jax.tree.structure(
        slow_vars["params"]
    )

    outs_f = fast.apply(variables, skips, focal, train=False)
    outs_s = slow.apply(variables, skips, focal, train=False)
    names = ["lpg8x8", "lpg4x4", "lpg2x2", "reduc1x1", "depth"]
    for name, a, b in zip(names, outs_f, outs_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_fast_tail_bf16_matches_f32(rng):
    """The bf16 fast tail takes different exact-math branches (fused
    phase conv, block-diag grouped 1x1s, padded depth head); it must
    track the f32 plain tail within bf16 tolerance."""
    channels = [64, 64, 128, 256, 1024]
    divs = [2, 4, 8, 16, 32]
    skips = [
        jnp.asarray(
            rng.normal(size=(2, H // d, W // d, c)).astype(np.float32) * 0.2
        )
        for d, c in zip(divs, channels)
    ]
    focal = jnp.array([518.8579, 600.0])

    slow = BTSDecoder(max_depth=10.0, dataset="nyu", fast_tail=False)
    fast_bf = BTSDecoder(
        max_depth=10.0, dataset="nyu", fast_tail=True, dtype=jnp.bfloat16
    )
    variables = slow.init(jax.random.key(0), skips, focal, train=False)
    outs_s = slow.apply(variables, skips, focal, train=False)
    outs_b = fast_bf.apply(variables, skips, focal, train=False)
    names = ["lpg8x8", "lpg4x4", "lpg2x2", "reduc1x1", "depth"]
    for name, a, b in zip(names, outs_b, outs_s):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / np.abs(b).max()
        assert rel < 0.03, (name, rel)
