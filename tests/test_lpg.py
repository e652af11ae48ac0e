"""LPG op tests: shape, golden values, gradient correctness (all impls)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.ops.lpg import (
    decode_plane_eq,
    local_planar_guidance,
    lpg_reference,
    normalize_plane,
)


def _lpg_numpy(plane_eq: np.ndarray, r: int) -> np.ndarray:
    """Scalar-loop oracle mirroring the reference CPU kernel
    (local_planar_guidance.cc:74-115)."""
    b, h, w, _ = plane_eq.shape
    out = np.zeros((b, h * r, w * r), dtype=np.float64)
    for bi in range(b):
        for y in range(h * r):
            for x in range(w * r):
                n1, n2, n3, n4 = plane_eq[bi, y // r, x // r]
                u = ((x % r) - (r - 1) / 2.0) / r
                v = ((y % r) - (r - 1) / 2.0) / r
                out[bi, y, x] = n4 / (n1 * u + n2 * v + n3)
    return out


def _random_plane_eq(rng, b=2, h=3, w=5):
    """Random but well-conditioned plane equations (unit normal, n3 > 0)."""
    theta = rng.uniform(0.05, np.pi / 3, size=(b, h, w))
    phi = rng.uniform(0, 2 * np.pi, size=(b, h, w))
    dist = rng.uniform(0.5, 10.0, size=(b, h, w))
    n1 = np.sin(theta) * np.cos(phi)
    n2 = np.sin(theta) * np.sin(phi)
    n3 = np.cos(theta)
    return np.stack([n1, n2, n3, dist], axis=-1).astype(np.float32)


@pytest.mark.parametrize("r", [2, 4, 8])
def test_lpg_matches_scalar_oracle(rng, r):
    pe = _random_plane_eq(rng)
    got = np.asarray(local_planar_guidance(jnp.asarray(pe), r))
    want = _lpg_numpy(pe, r)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lpg_constant_plane_is_constant_depth(rng):
    # A fronto-parallel plane (n=(0,0,1), dist=d) gives uniform depth d.
    pe = np.zeros((1, 2, 2, 4), dtype=np.float32)
    pe[..., 2] = 1.0
    pe[..., 3] = 5.0
    out = np.asarray(local_planar_guidance(jnp.asarray(pe), 4))
    np.testing.assert_allclose(out, 5.0, rtol=1e-6)


@pytest.mark.parametrize("r", [2, 4])
def test_lpg_custom_vjp_matches_autodiff(rng, r):
    """Custom VJP == autodiff through the reference forward (the correct
    gradient; NOT the reference CUDA backward which drops the n4 factor)."""
    pe = jnp.asarray(_random_plane_eq(rng, b=1, h=2, w=3))
    g = jnp.asarray(rng.normal(size=(1, 2 * r, 3 * r)).astype(np.float32))

    _, vjp_custom = jax.vjp(lambda p: local_planar_guidance(p, r), pe)
    _, vjp_auto = jax.vjp(lambda p: lpg_reference(p, r), pe)
    (d_custom,) = vjp_custom(g)
    (d_auto,) = vjp_auto(g)
    np.testing.assert_allclose(
        np.asarray(d_custom), np.asarray(d_auto), rtol=1e-4, atol=1e-5
    )


def test_lpg_finite_difference(rng):
    """Finite-difference check of the custom VJP (SURVEY.md §4)."""
    r = 2
    pe_np = _random_plane_eq(rng, b=1, h=1, w=2).astype(np.float32)

    def f(p):
        return jnp.sum(local_planar_guidance(p, r) ** 2)

    g = jax.grad(f)(jnp.asarray(pe_np))
    eps = 1e-3
    for idx in np.ndindex(pe_np.shape):
        pp = pe_np.copy()
        pp[idx] += eps
        pm = pe_np.copy()
        pm[idx] -= eps
        fd = (float(f(jnp.asarray(pp))) - float(f(jnp.asarray(pm)))) / (2 * eps)
        assert abs(fd - float(g[idx])) < 5e-2 * max(1.0, abs(fd))


def test_decode_plane_eq_unit_normal(rng):
    raw = jnp.asarray(rng.normal(size=(2, 3, 4, 3)).astype(np.float32))
    pe = decode_plane_eq(raw, max_depth=10.0)
    assert pe.shape == (2, 3, 4, 4)
    norms = np.linalg.norm(np.asarray(pe[..., :3]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # dist in [0, max_depth]
    assert float(jnp.min(pe[..., 3])) >= 0.0
    assert float(jnp.max(pe[..., 3])) <= 10.0
    # normalize_plane is a no-op on decoded planes
    np.testing.assert_allclose(
        np.asarray(normalize_plane(pe)), np.asarray(pe), rtol=1e-5
    )


def test_lpg_jit_and_vmap(rng):
    pe = jnp.asarray(_random_plane_eq(rng))
    jitted = jax.jit(lambda p: local_planar_guidance(p, 4))
    np.testing.assert_allclose(
        np.asarray(jitted(pe)),
        np.asarray(local_planar_guidance(pe, 4)),
        rtol=1e-6,
    )
