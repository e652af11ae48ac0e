"""Scale-invariant log (silog) loss.

Reference: pytorch/bts.py:41-48 —
    d = log(pred[mask]) - log(gt[mask])
    loss = sqrt(mean(d^2) - variance_focus * mean(d)^2) * 10

JAX requires static shapes under jit, so boolean advanced indexing is
replaced by weighted (masked) means — numerically identical for any mask
with at least one valid element.
"""

from __future__ import annotations

import jax.numpy as jnp


def silog_loss(depth_est, depth_gt, mask, variance_focus: float = 0.85):
    """Masked silog loss.

    Args:
      depth_est: predicted depth, any shape.
      depth_gt: ground-truth depth, same shape.
      mask: boolean (or {0,1} float) validity mask, same shape. Reference
        builds it as depth_gt > 0.1 (NYU) / > 1.0 (KITTI)
        (pytorch/bts_main.py:449-452).
      variance_focus: lambda in the paper (reference default 0.85).

    Returns:
      Scalar loss (f32).
    """
    m = mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m), 1.0)
    # Guard log of masked-out (possibly zero) entries; they get zero weight.
    safe_est = jnp.where(m > 0, depth_est, 1.0)
    safe_gt = jnp.where(m > 0, depth_gt, 1.0)
    d = (jnp.log(safe_est) - jnp.log(safe_gt)) * m
    mean_d2 = jnp.sum(d * d) / count
    mean_d = jnp.sum(d) / count
    return jnp.sqrt(mean_d2 - variance_focus * mean_d * mean_d) * 10.0
