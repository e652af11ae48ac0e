"""Pallas LPG kernel vs the XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.ops.lpg import local_planar_guidance, lpg_reference
from bts_tpu.ops.lpg_pallas import lpg_pallas


def _random_plane_eq(rng, b=2, h=4, w=6):
    theta = rng.uniform(0.05, np.pi / 3, size=(b, h, w))
    phi = rng.uniform(0, 2 * np.pi, size=(b, h, w))
    dist = rng.uniform(0.5, 10.0, size=(b, h, w))
    n1 = np.sin(theta) * np.cos(phi)
    n2 = np.sin(theta) * np.sin(phi)
    n3 = np.cos(theta)
    return np.stack([n1, n2, n3, dist], axis=-1).astype(np.float32)


@pytest.mark.parametrize("r", [2, 4, 8])
def test_pallas_matches_xla(rng, r):
    pe = jnp.asarray(_random_plane_eq(rng))
    got = np.asarray(lpg_pallas(pe, r, interpret=True))
    want = np.asarray(lpg_reference(pe, r))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_grad_matches_xla(rng):
    r = 4
    pe = jnp.asarray(_random_plane_eq(rng, b=1, h=2, w=3))
    g = jnp.asarray(rng.normal(size=(1, 2 * r, 3 * r)).astype(np.float32))

    _, vjp_p = jax.vjp(lambda p: lpg_pallas(p, r, interpret=True), pe)
    _, vjp_x = jax.vjp(lambda p: local_planar_guidance(p, r), pe)
    np.testing.assert_allclose(
        np.asarray(vjp_p(g)[0]), np.asarray(vjp_x(g)[0]), rtol=1e-4, atol=1e-5
    )


def test_pallas_under_jit(rng):
    pe = jnp.asarray(_random_plane_eq(rng))
    f = jax.jit(lambda p: lpg_pallas(p, 2, interpret=True))
    np.testing.assert_allclose(
        np.asarray(f(pe)),
        np.asarray(lpg_reference(pe, 2)),
        rtol=1e-5,
        atol=1e-6,
    )
