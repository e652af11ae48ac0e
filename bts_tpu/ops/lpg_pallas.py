"""Fused Pallas TPU kernel for Local Planar Guidance.

TPU-native replacement for the reference's CUDA kernel
(tensorflow/custom_layer/local_planar_guidance.cu:33-93, one thread per
output pixel). Design, per the Pallas TPU model:

  * one grid program per image (the whole plane-eq tile and the output map
    fit comfortably in VMEM at BTS resolutions);
  * plane-eq channels arrive as (B, 4, H, W) so the spatial dims map onto
    sublanes x lanes (the NHWC 4-channel layout would waste 97% of lanes);
  * the r-fold interleaved *lane* expansion (n[y, x//r]) is expressed as a
    matmul with a one-hot expansion matrix E[w, w*r] — data movement on the
    MXU at full throughput instead of an unsupported strided relayout;
  * the r-fold *sublane* expansion is a leading-dim broadcast+reshape
    (free on TPU);
  * u/v sub-pixel offsets come from broadcasted_iota on the output tile,
    fused into the final elementwise divide (VPU).

Reads 4*H*W floats, writes H*W*r^2 floats, one pass — HBM-bandwidth-optimal.

The backward pass (custom VJP) reduces each r x r output tile back to one
cell; it reuses the XLA reduction path from bts_tpu.ops.lpg (bandwidth-bound,
already a single fused pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bts_tpu.ops.lpg import _lpg_bwd


def _lpg_kernel(pe_ref, out_ref, *, upratio: int):
    """pe_ref: (1, 4, H, W) f32; out_ref: (1, H*r, W*r) f32."""
    r = upratio
    _, _, h, w = pe_ref.shape
    hr, wr = h * r, w * r

    n1 = pe_ref[0, 0]
    n2 = pe_ref[0, 1]
    n3 = pe_ref[0, 2]
    n4 = pe_ref[0, 3]

    # One-hot lane-expansion matrix E[w, w*r]: E[i, j] = (j // r == i).
    src = jax.lax.broadcasted_iota(jnp.int32, (w, wr), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (w, wr), 1)
    expand = (dst // r == src).astype(jnp.float32)

    def widen(n):
        # (H, W) -> lanes (H, W*r) on the MXU -> sublanes (H*r, W*r) via
        # leading-dim broadcast+reshape. HIGHEST precision: the one-hot
        # expansion must move f32 values exactly (bf16 would round them).
        wide = jnp.dot(
            n,
            expand,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        wide = jnp.broadcast_to(wide[:, None, :], (h, r, wr))
        return wide.reshape(hr, wr)

    col = jax.lax.broadcasted_iota(jnp.int32, (hr, wr), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (hr, wr), 0)
    u = ((col % r).astype(jnp.float32) - (r - 1) * 0.5) / r
    v = ((row % r).astype(jnp.float32) - (r - 1) * 0.5) / r

    den = widen(n1) * u + widen(n2) * v + widen(n3)
    out_ref[0] = widen(n4) / den


def _lpg_pallas_fwd_impl(plane_eq: jax.Array, upratio: int, interpret: bool):
    b, h, w, _ = plane_eq.shape
    r = upratio
    pe = jnp.transpose(plane_eq.astype(jnp.float32), (0, 3, 1, 2))
    kernel = functools.partial(_lpg_kernel, upratio=r)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 4, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, h * r, w * r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * r, w * r), jnp.float32),
        interpret=interpret,
    )(pe)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _lpg_pallas(plane_eq, upratio: int, interpret: bool):
    return _lpg_pallas_fwd_impl(plane_eq, upratio, interpret)


def _fwd(plane_eq, upratio, interpret):
    return _lpg_pallas_fwd_impl(plane_eq, upratio, interpret), plane_eq


def _bwd(upratio, interpret, plane_eq, g):
    # Same analytic gradient as the XLA path (bts_tpu/ops/lpg.py:_lpg_bwd).
    return _lpg_bwd(upratio, plane_eq, g)


_lpg_pallas.defvjp(_fwd, _bwd)


def lpg_pallas(plane_eq: jax.Array, upratio: int, interpret=None) -> jax.Array:
    """Pallas LPG. plane_eq (B,H,W,4) -> (B, H*r, W*r).

    interpret=None auto-selects interpreter mode off-TPU (tests run on the
    CPU backend; the compiled path runs on real TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _lpg_pallas(plane_eq, upratio, bool(interpret))
