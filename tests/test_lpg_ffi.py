"""Native C++ CPU LPG kernel (JAX FFI) vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.ops.lpg import local_planar_guidance, lpg_reference


def _random_plane_eq(rng, b=2, h=3, w=5):
    theta = rng.uniform(0.05, np.pi / 3, size=(b, h, w))
    phi = rng.uniform(0, 2 * np.pi, size=(b, h, w))
    dist = rng.uniform(0.5, 10.0, size=(b, h, w))
    return np.stack(
        [
            np.sin(theta) * np.cos(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(theta),
            dist,
        ],
        axis=-1,
    ).astype(np.float32)


@pytest.fixture(scope="module")
def ffi_available():
    from bts_tpu.ops import lpg_ffi

    try:
        lpg_ffi.build_library()
    except Exception as e:  # toolchain missing — skip, not fail
        pytest.skip(f"native build unavailable: {e}")
    return lpg_ffi


@pytest.mark.parametrize("r", [2, 4, 8])
def test_ffi_forward_matches_xla(ffi_available, rng, r):
    pe = jnp.asarray(_random_plane_eq(rng))
    got = np.asarray(ffi_available.lpg_ffi(pe, r))
    want = np.asarray(lpg_reference(pe, r))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ffi_grad_matches_xla(ffi_available, rng):
    r = 4
    pe = jnp.asarray(_random_plane_eq(rng, b=1, h=2, w=3))
    g = jnp.asarray(rng.normal(size=(1, 2 * r, 3 * r)).astype(np.float32))
    _, vjp_f = jax.vjp(lambda p: ffi_available.lpg_ffi(p, r), pe)
    _, vjp_x = jax.vjp(lambda p: local_planar_guidance(p, r), pe)
    np.testing.assert_allclose(
        np.asarray(vjp_f(g)[0]), np.asarray(vjp_x(g)[0]), rtol=1e-4, atol=1e-5
    )


def test_ffi_under_jit(ffi_available, rng):
    pe = jnp.asarray(_random_plane_eq(rng))
    f = jax.jit(lambda p: ffi_available.lpg_ffi(p, 2))
    np.testing.assert_allclose(
        np.asarray(f(pe)), np.asarray(lpg_reference(pe, 2)), rtol=1e-5,
        atol=1e-6,
    )


def test_dispatch_ffi_impl(ffi_available, rng):
    pe = jnp.asarray(_random_plane_eq(rng))
    got = np.asarray(local_planar_guidance(pe, 4, impl="ffi"))
    want = np.asarray(lpg_reference(pe, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
