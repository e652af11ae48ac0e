"""Local Planar Guidance (LPG) — the reference's only native op, TPU-native.

Semantics (reference: pytorch/bts.py:124-146, the C++/CUDA custom op
tensorflow/custom_layer/local_planar_guidance.{cc,cu}):

Given a per-cell plane equation ``(n1, n2, n3, n4)`` on an ``(H, W)`` grid and
an integer upsampling ratio ``r``, produce a dense depth map of shape
``(H*r, W*r)`` where the output pixel at ``(y, x)`` lies on the plane of input
cell ``(y//r, x//r)``:

    u = ((x % r) - (r - 1)/2) / r
    v = ((y % r) - (r - 1)/2) / r
    depth[y, x] = n4 / (n1*u + n2*v + n3)

Layout here is TPU-native NHWC: ``plane_eq`` is ``(B, H, W, 4)`` and the
output is ``(B, H*r, W*r)``.

The custom VJP implements the analytically-correct gradient

    d n1 = -sum_{tile} g * n4 * u / den^2
    d n2 = -sum_{tile} g * n4 * v / den^2
    d n3 = -sum_{tile} g * n4 / den^2
    d n4 =  sum_{tile} g / den

(summing each input cell's r x r output tile). Note: the reference's
hand-derived CUDA/C++ backward drops the ``n4`` factor in the n1/n2/n3 terms
(local_planar_guidance.cc:291-293) — a bug in the reference TF path; the
reference PyTorch path (autograd through pytorch/bts.py:132-146) computes the
correct gradient, which is what we match. ``focal`` is an input of the
reference op but unused in its math (local_planar_guidance.cu:56); we omit it.

Implementations:
  - ``xla``:    pure-XLA broadcast formulation (fuses into one pass; default)
  - ``pallas``: fused Pallas TPU kernel (bts_tpu/ops/lpg_pallas.py)
  - ``ffi``:    C++ CPU kernel via the JAX FFI (native/lpg_cpu.cc), the
                parity equivalent of the reference's C++ CPU kernel
                (local_planar_guidance.cc:74-115)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _uv_grids(upratio: int, dtype) -> tuple[jax.Array, jax.Array]:
    """Sub-pixel offsets u (along W) and v (along H), each of shape (r,).

    Reference: pytorch/bts.py:140-144 — (arange(r) - (r-1)/2) / r.
    """
    r = upratio
    base = (jnp.arange(r, dtype=dtype) - (r - 1) * 0.5) / r
    return base, base


def _lpg_forward(plane_eq: jax.Array, upratio: int) -> jax.Array:
    """Broadcast-formulated forward. plane_eq (B,H,W,4) -> (B,H*r,W*r).

    Computes depth over (B, H, r, W, r) then merges adjacent dims — a
    data-movement-free reshape, so XLA emits a single fused elementwise pass
    writing the output exactly once (bandwidth speed-of-light for this op).
    """
    r = upratio
    b, h, w, _ = plane_eq.shape
    dtype = plane_eq.dtype
    u, v = _uv_grids(r, dtype)
    n1 = plane_eq[..., 0][:, :, None, :, None]  # (B,H,1,W,1)
    n2 = plane_eq[..., 1][:, :, None, :, None]
    n3 = plane_eq[..., 2][:, :, None, :, None]
    n4 = plane_eq[..., 3][:, :, None, :, None]
    # den: (B,H,r,W,r); v varies along axis 2 (rows), u along axis 4 (cols).
    den = n1 * u[None, None, None, None, :] + n2 * v[None, None, :, None, None] + n3
    depth = n4 / den
    return depth.reshape(b, h * r, w * r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _lpg_xla(plane_eq: jax.Array, upratio: int) -> jax.Array:
    return _lpg_forward(plane_eq, upratio)


def _lpg_fwd(plane_eq, upratio):
    return _lpg_forward(plane_eq, upratio), plane_eq


def _lpg_bwd(upratio, plane_eq, g):
    r = upratio
    b, h, w, _ = plane_eq.shape
    dtype = plane_eq.dtype
    u, v = _uv_grids(r, dtype)
    n1 = plane_eq[..., 0][:, :, None, :, None]
    n2 = plane_eq[..., 1][:, :, None, :, None]
    n3 = plane_eq[..., 2][:, :, None, :, None]
    n4 = plane_eq[..., 3][:, :, None, :, None]
    den = n1 * u[None, None, None, None, :] + n2 * v[None, None, :, None, None] + n3
    gt = g.reshape(b, h, r, w, r)  # tile view of the cotangent
    inv_den = 1.0 / den
    common = gt * n4 * inv_den * inv_den  # g * n4 / den^2
    dn1 = -jnp.sum(common * u[None, None, None, None, :], axis=(2, 4))
    dn2 = -jnp.sum(common * v[None, None, :, None, None], axis=(2, 4))
    dn3 = -jnp.sum(common, axis=(2, 4))
    dn4 = jnp.sum(gt * inv_den, axis=(2, 4))
    return (jnp.stack([dn1, dn2, dn3, dn4], axis=-1),)


_lpg_xla.defvjp(_lpg_fwd, _lpg_bwd)


def lpg_reference(plane_eq: jax.Array, upratio: int) -> jax.Array:
    """Un-jitted reference forward (no custom VJP) for gradient checking."""
    return _lpg_forward(plane_eq, upratio)


def local_planar_guidance(
    plane_eq: jax.Array, upratio: int, impl: str = "auto"
) -> jax.Array:
    """LPG dispatch. plane_eq (B,H,W,4) NHWC -> depth (B, H*r, W*r)."""
    if impl == "auto":
        impl = "xla"
    if impl == "xla":
        return _lpg_xla(plane_eq, upratio)
    if impl == "pallas":
        from bts_tpu.ops.lpg_pallas import lpg_pallas

        return lpg_pallas(plane_eq, upratio)
    if impl == "ffi":
        from bts_tpu.ops.lpg_ffi import lpg_ffi

        return lpg_ffi(plane_eq, upratio)
    raise ValueError(f"unknown LPG impl: {impl!r}")


def lpg_expand(
    plane_eq: jax.Array,
    upratio: int,
    e: int,
    base: int = 0,
    step: int = 1,
) -> jax.Array:
    """Generalized LPG sampler: expand each plane cell e-fold per dim,
    evaluating the plane at sub-pixel indices ``sub = base + step * t``
    (t in [0, e)) of the r-fold grid. Returns (B, Hc*e, Wc*e).

    Special cases:
      * e=r, base=0, step=1  == the standard LPG forward;
      * e=r//2, base=phase, step=2  == one 2x2 phase of the output
        (space-to-depth decomposition of LPG);
      * e=2, base=0, step=r//2     == the nearest-downsampled-by-(r/2)
        full-resolution map (out[i] = full[(r//2)*i]), i.e. the decoder's
        depth_Xx_scaled_ds tensors (pytorch/bts.py:229,243) computed
        directly without materializing the full-resolution map.
    """
    r = upratio
    b, h, w, _ = plane_eq.shape
    dtype = plane_eq.dtype
    sub = base + step * jnp.arange(e, dtype=dtype)
    uv = (sub - (r - 1) * 0.5) / r  # (e,)
    n1 = plane_eq[..., 0][:, :, None, :, None]
    n2 = plane_eq[..., 1][:, :, None, :, None]
    n3 = plane_eq[..., 2][:, :, None, :, None]
    n4 = plane_eq[..., 3][:, :, None, :, None]
    den = n1 * uv[None, None, None, None, :] + n2 * uv[None, None, :, None, None] + n3
    return (n4 / den).reshape(b, h * e, w * e)


def lpg_s2d(plane_eq: jax.Array, upratio: int) -> jax.Array:
    """LPG output in space-to-depth form: (B, H/2, W/2, 4) where channel
    p = 2a + b holds full-res pixels (2i+a, 2j+b). depth_to_space of this
    equals the standard full-resolution LPG exactly.
    """
    r = upratio
    e = r // 2
    b, h, w, _ = plane_eq.shape
    dtype = plane_eq.dtype
    phases = []
    for a in (0, 1):
        v_sub = a + 2 * jnp.arange(e, dtype=dtype)
        v = (v_sub - (r - 1) * 0.5) / r
        for bb in (0, 1):
            u_sub = bb + 2 * jnp.arange(e, dtype=dtype)
            u = (u_sub - (r - 1) * 0.5) / r
            n1 = plane_eq[..., 0][:, :, None, :, None]
            n2 = plane_eq[..., 1][:, :, None, :, None]
            n3 = plane_eq[..., 2][:, :, None, :, None]
            n4 = plane_eq[..., 3][:, :, None, :, None]
            den = (
                n1 * u[None, None, None, None, :]
                + n2 * v[None, None, :, None, None]
                + n3
            )
            phases.append((n4 / den).reshape(b, h * e, w * e))
    return jnp.stack(phases, axis=-1)


def depth_to_space_phases(x: jax.Array) -> jax.Array:
    """(B, H2, W2, 4) phase-blocked (p = 2a + b) -> (B, 2*H2, 2*W2, 1)."""
    b, h2, w2, _ = x.shape
    x = x.reshape(b, h2, w2, 2, 2)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, 2 * h2, 2 * w2)[..., None]


def normalize_plane(plane: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize the plane normal (first 3 channels of last axis).

    Reference: pytorch/bts.py:223-226 (torch F.normalize(p=2, dim=1) with
    eps=1e-12 torch default). The sin/cos plane decode already yields a unit
    normal, so this is an idempotent safety op kept for exact parity.
    """
    normal = plane[..., :3]
    norm = jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), eps)
    return jnp.concatenate([normal / norm, plane[..., 3:]], axis=-1)


def decode_plane_eq(
    raw: jax.Array, max_depth: float, theta_max: float = jnp.pi / 3
) -> jax.Array:
    """Decode a raw 3-channel head output into a unit plane equation.

    Reference: pytorch/bts.py:110-122 (theta = sigmoid(x0) * pi/3 — the PT
    convention and the default here). The TF twin uses pi/6
    (tensorflow/bts.py:152): pass theta_max=pi/6 when running TF-zoo
    weights (models/bts.py flavor='tf'). phi = sigmoid(x1) * 2*pi,
    dist = sigmoid(x2) * max_depth; n = (sin t cos p, sin t sin p, cos t, d).
    """
    theta = jax.nn.sigmoid(raw[..., 0]) * theta_max
    phi = jax.nn.sigmoid(raw[..., 1]) * (2 * jnp.pi)
    dist = jax.nn.sigmoid(raw[..., 2]) * max_depth
    sin_t = jnp.sin(theta)
    n1 = sin_t * jnp.cos(phi)
    n2 = sin_t * jnp.sin(phi)
    n3 = jnp.cos(theta)
    return jnp.stack([n1, n2, n3, dist], axis=-1)
