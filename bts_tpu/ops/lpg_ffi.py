"""JAX FFI binding for the native CPU LPG kernel (native/lpg_cpu.cc).

The native layer mirrors the reference's C++ custom op surface
(tensorflow/custom_layer/local_planar_guidance.cc): a compiled CPU
forward/backward pair, here registered as XLA FFI custom calls on the 'cpu'
platform and wired into jax.custom_vjp. On TPU the Pallas kernel / XLA path
is used instead (bts_tpu/ops/lpg.py dispatch).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import jax
import jax.numpy as jnp

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblpg_cpu.so")

_registered = False


def build_library(force: bool = False) -> str:
    """Compile native/lpg_cpu.cc if needed. Returns the .so path."""
    src = os.path.join(_NATIVE_DIR, "lpg_cpu.cc")
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    ):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    return _LIB_PATH


def _ensure_registered() -> None:
    global _registered
    if _registered:
        return
    path = build_library()
    lib = ctypes.cdll.LoadLibrary(path)
    for name, symbol in (
        ("bts_lpg_fwd", "BtsLpgForward"),
        ("bts_lpg_bwd", "BtsLpgBackward"),
    ):
        handler = jax.ffi.pycapsule(getattr(lib, symbol))
        jax.ffi.register_ffi_target(name, handler, platform="cpu")
    _registered = True


def _fwd_call(plane_eq: jax.Array, upratio: int) -> jax.Array:
    _ensure_registered()
    b, h, w, _ = plane_eq.shape
    out_type = jax.ShapeDtypeStruct((b, h * upratio, w * upratio), jnp.float32)
    return jax.ffi.ffi_call("bts_lpg_fwd", out_type)(
        plane_eq.astype(jnp.float32), upratio=np_int64(upratio)
    )


def _bwd_call(g: jax.Array, plane_eq: jax.Array, upratio: int) -> jax.Array:
    _ensure_registered()
    out_type = jax.ShapeDtypeStruct(plane_eq.shape, jnp.float32)
    return jax.ffi.ffi_call("bts_lpg_bwd", out_type)(
        g.astype(jnp.float32),
        plane_eq.astype(jnp.float32),
        upratio=np_int64(upratio),
    )


def np_int64(x: int):
    import numpy as np

    return np.int64(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lpg_ffi(plane_eq: jax.Array, upratio: int) -> jax.Array:
    """Native-CPU LPG: plane_eq (B,H,W,4) -> (B, H*r, W*r)."""
    return _fwd_call(plane_eq, upratio)


def _vjp_fwd(plane_eq, upratio):
    return _fwd_call(plane_eq, upratio), plane_eq


def _vjp_bwd(upratio, plane_eq, g):
    return (_bwd_call(g, plane_eq, upratio),)


lpg_ffi.defvjp(_vjp_fwd, _vjp_bwd)
