"""Fused DenseNet layer kernel (Pallas TPU, bf16 inference).

A torchvision dense layer is BN1 -> ReLU -> conv1x1 (4g) -> BN2 -> ReLU ->
conv3x3 (g) (the reference wraps torchvision, pytorch/bts.py:273-280).
Under XLA this lowers to two conv fusions with the 4g-channel bottleneck
tensor round-tripping through HBM between them, and the 3x3's g=48-wide
output runs the MXU at ~19% of peak (profiled on v5e at 480x640 b64:
5.6 ms per block1 layer vs a ~1.6 ms HBM roofline).

This kernel computes the whole layer in one pass per batch item:

  * the full feature map of one image is DMA'd to VMEM once (block1 peak
    ~15 MB bf16; v5e VMEM = 128 MB) — the 4g bottleneck never touches HBM;
  * BN1/BN2 are pre-folded to per-channel scale/bias (inference mode);
  * two layout variants for the 3x3:

    - 'taps' — nine shifted (H, W, Cmid) x (Cmid, G) dots on a zero-padded
      VMEM scratch. Simple, any even/odd W, but N = G = 48 output lanes
      (MXU at 37%).
    - 'eo' (parity-split) — the feature map is carried as two tensors
      holding the even / odd W-columns. Per dh, ONE dot emits both columns
      u = (2u', 2u'+1): lhs = lane-concat of the four distinct taps
      [zo[u-1], ze[u], zo[u], ze[u+1]] (unit-stride slices only — Mosaic
      cannot lower strided gathers or sublane->lane shape casts), rhs =
      the repacked (4*Cmid, 2G) kernel. N = 2G = 96 lanes at 4/3 the
      FLOPs: net ~1.5x on the systolic array, exact same math.

Inference-only (bf16). Training keeps the unfused flax path — same
params, reference-exact accumulation order, simple autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024


def fold_bn(scale, bias, mean, var, eps):
    """Fold BatchNorm (inference) into per-channel (mul, add), f32."""
    mul = scale * jax.lax.rsqrt(var + eps)
    return mul, bias - mean * mul


def pack_w2_eo(w2):
    """Repack a (3, 3, Cmid, G) conv kernel for the parity-split matmul.

    Returns (3, 4*Cmid, 2*G). Row blocks correspond to the lane-concat
    [zo[u-1], ze[u], zo[u], ze[u+1]]; column halves to (even, odd) output
    columns (2u, 2u+1). Even output taps (2u-1, 2u, 2u+1) hit blocks
    (0, 1, 2) with W2[:, 0..2]; odd output taps (2u, 2u+1, 2u+2) hit
    blocks (1, 2, 3) with W2[:, 0..2].
    """
    kh, kw, cmid, g = w2.shape
    assert (kh, kw) == (3, 3)
    w2q = jnp.zeros((3, 4 * cmid, 2 * g), w2.dtype)
    for blk, col, dw in (
        (0, 0, 0), (1, 0, 1), (2, 0, 2),  # even outputs
        (1, 1, 0), (2, 1, 1), (3, 1, 2),  # odd outputs
    ):
        w2q = w2q.at[
            :, blk * cmid : (blk + 1) * cmid, col * g : (col + 1) * g
        ].set(w2[:, dw])
    return w2q


def _bottleneck(x_ref, s1, b1, w1_ref, s2, b2):
    """BN1 + ReLU (VPU), 1x1 conv (MXU, f32 acc), BN2 + ReLU."""
    y = jnp.maximum(x_ref[0] * s1[0] + b1[0], 0.0)
    t = jax.lax.dot_general(
        y,
        w1_ref[...],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(t * s2[0] + b2[0], 0.0)


def _kernel_taps(x_ref, s1, b1, w1_ref, s2, b2, w2_ref, out_ref, z_scr, acc_scr):
    h = out_ref.shape[1]
    w = out_ref.shape[2]
    z_scr[...] = jnp.zeros_like(z_scr)
    z_scr[1 : h + 1, 1 : w + 1, :] = _bottleneck(
        x_ref, s1, b1, w1_ref, s2, b2
    ).astype(z_scr.dtype)
    z = z_scr[...]
    first = True
    for dh in range(3):
        for dw in range(3):
            part = jax.lax.dot_general(
                z[dh : dh + h, dw : dw + w, :],
                w2_ref[dh, dw],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if first:
                acc_scr[...] = part
                first = False
            else:
                acc_scr[...] += part
    out_ref[0] = acc_scr[...].astype(out_ref.dtype)


def _kernel_eo(
    xe_ref, xo_ref, s1, b1, w1_ref, s2, b2, w2q_ref,
    out_ref, ze_scr, zo_scr, acc_scr,
):
    h = out_ref.shape[1]
    u = out_ref.shape[2]  # W / 2
    ze_scr[...] = jnp.zeros_like(ze_scr)
    zo_scr[...] = jnp.zeros_like(zo_scr)
    ze_scr[1 : h + 1, 1 : u + 1, :] = _bottleneck(
        xe_ref, s1, b1, w1_ref, s2, b2
    ).astype(ze_scr.dtype)
    zo_scr[1 : h + 1, 1 : u + 1, :] = _bottleneck(
        xo_ref, s1, b1, w1_ref, s2, b2
    ).astype(zo_scr.dtype)
    ze, zo = ze_scr[...], zo_scr[...]
    cmid = w1_ref.shape[1]
    # The four distinct taps the output-column pair (2u, 2u+1) reads.
    # (A lane-concat into one K=4*Cmid dot would be tidier, but Mosaic
    # cannot concat operands with mismatched sublane offsets; twelve
    # K=Cmid, N=2G dots carry identical FLOPs.)
    taps = (
        zo[:, 0:u, :],        # zo[u-1]
        ze[:, 1 : u + 1, :],  # ze[u]
        zo[:, 1 : u + 1, :],  # zo[u]
        ze[:, 2 : u + 2, :],  # ze[u+1]
    )
    first = True
    for dh in range(3):
        for blk, tap in enumerate(taps):
            part = jax.lax.dot_general(
                tap[dh : dh + h],
                w2q_ref[dh, blk * cmid : (blk + 1) * cmid, :],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if first:
                acc_scr[...] = part
                first = False
            else:
                acc_scr[...] += part
    out_ref[0] = acc_scr[...].astype(out_ref.dtype)


def _const_spec(shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def _batch_spec(shape):
    return pl.BlockSpec(
        (1,) + shape,
        lambda i: (i,) + tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dense_layer(x, s1, b1, w1, s2, b2, w2, interpret=False):
    """relu(bn2(conv1x1(relu(bn1(x))))) -> conv3x3 pad=1, fused ('taps').

    Args:
      x: (B, H, W, C) bf16 feature map.
      s1, b1: (C,) folded BN1 scale/bias (see fold_bn).
      w1: (C, Cmid) 1x1 kernel.  s2, b2: (Cmid,) folded BN2 scale/bias.
      w2: (3, 3, Cmid, G) 3x3 kernel.
    Returns: (B, H, W, G) in x.dtype.
    """
    b, h, w, c = x.shape
    cmid = w1.shape[1]
    g = w2.shape[3]
    dt = x.dtype
    as_row = lambda v: v.reshape(1, -1).astype(dt)
    return pl.pallas_call(
        _kernel_taps,
        grid=(b,),
        in_specs=[
            _batch_spec((h, w, c)),
            _const_spec((1, c)),
            _const_spec((1, c)),
            _const_spec((c, cmid)),
            _const_spec((1, cmid)),
            _const_spec((1, cmid)),
            _const_spec((3, 3, cmid, g)),
        ],
        out_specs=_batch_spec((h, w, g)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, g), dt),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cmid), dt),
            pltpu.VMEM((h, w, g), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(
        x.astype(dt),
        as_row(s1),
        as_row(b1),
        w1.astype(dt),
        as_row(s2),
        as_row(b2),
        w2.astype(dt),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dense_layer_eo(xe, xo, s1, b1, w1, s2, b2, w2q, interpret=False):
    """Parity-split fused dense layer.

    Args:
      xe, xo: (B, H, U, C) even / odd W-columns of the feature map
        (xe[..., u, :] = x[..., 2u, :], xo[..., u, :] = x[..., 2u+1, :]).
      s1, b1, w1, s2, b2: as in fused_dense_layer.
      w2q: (3, 4*Cmid, 2*G) repacked 3x3 kernel (see pack_w2_eo).
    Returns: (B, H, U, 2G) — lanes [0:G] are the even output columns,
      [G:2G] the odd ones.
    """
    b, h, u, c = xe.shape
    cmid = w1.shape[1]
    g2 = w2q.shape[2]
    dt = xe.dtype
    as_row = lambda v: v.reshape(1, -1).astype(dt)
    return pl.pallas_call(
        _kernel_eo,
        grid=(b,),
        in_specs=[
            _batch_spec((h, u, c)),
            _batch_spec((h, u, c)),
            _const_spec((1, c)),
            _const_spec((1, c)),
            _const_spec((c, cmid)),
            _const_spec((1, cmid)),
            _const_spec((1, cmid)),
            _const_spec((3, 4 * cmid, g2)),
        ],
        out_specs=_batch_spec((h, u, g2)),
        out_shape=jax.ShapeDtypeStruct((b, h, u, g2), dt),
        scratch_shapes=[
            pltpu.VMEM((h + 2, u + 2, cmid), dt),
            pltpu.VMEM((h + 2, u + 2, cmid), dt),
            pltpu.VMEM((h, u, g2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(
        xe.astype(dt),
        xo.astype(dt),
        as_row(s1),
        as_row(b1),
        w1.astype(dt),
        as_row(s2),
        as_row(b2),
        w2q.astype(dt),
    )
