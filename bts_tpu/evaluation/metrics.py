"""The nine depth metrics.

Reference: pytorch/bts_main.py:144-165 / utils/eval_with_pngs.py:50-71 —
metric order [silog, abs_rel, log10, rms, sq_rel, log_rms, d1, d2, d3];
silog is scaled x100; d_k = mean(max(gt/pred, pred/gt) < 1.25^k).

Two implementations:
  * ``compute_errors`` — numpy, takes already-masked 1-D vectors, exactly the
    reference function (used by PNG eval and offline eval).
  * ``compute_errors_masked`` — jit-compatible, takes full-resolution arrays
    plus a validity mask and returns per-image metric sums in a fixed-size
    accumulator so batched on-device eval can ``psum`` across the mesh
    (TPU-native replacement for dist.all_reduce at pytorch/bts_main.py:302).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

EVAL_METRICS = [
    "silog",
    "abs_rel",
    "log10",
    "rms",
    "sq_rel",
    "log_rms",
    "d1",
    "d2",
    "d3",
]
# First 6 are lower-better, last 3 higher-better
# (pytorch/bts_main.py:514-521 best-checkpoint logic).
NUM_LOWER_BETTER = 6
NUM_HIGHER_BETTER = 3


def compute_errors(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Nine metrics from masked 1-D gt/pred vectors (numpy).

    Matches reference pytorch/bts_main.py:144-165 exactly.
    """
    thresh = np.maximum(gt / pred, pred / gt)
    d1 = (thresh < 1.25).mean()
    d2 = (thresh < 1.25**2).mean()
    d3 = (thresh < 1.25**3).mean()

    rms = np.sqrt(((gt - pred) ** 2).mean())
    log_rms = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())

    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean(((gt - pred) ** 2) / gt)

    err = np.log(pred) - np.log(gt)
    silog = np.sqrt(np.mean(err**2) - np.mean(err) ** 2) * 100

    log10 = np.mean(np.abs(np.log10(pred) - np.log10(gt)))

    return np.array(
        [silog, abs_rel, log10, rms, sq_rel, log_rms, d1, d2, d3],
        dtype=np.float64,
    )


def compute_errors_masked(gt, pred, mask):
    """Jit-compatible nine metrics over a masked array.

    Args:
      gt, pred: arrays of identical shape (e.g. (H, W) or (B, H, W)). When
        batched, metrics are computed per-image over trailing axes.
      mask: boolean validity mask of the same shape.

    Returns:
      (metrics, valid): metrics with shape batch_shape + (9,) in EVAL_METRICS
      order, and valid = per-image "has any valid pixel" flag (f32 0/1).
      Images with an empty mask return zero metrics and valid = 0, matching
      the reference's skip-on-missing-gt behavior
      (pytorch/bts_main.py:258-260).
    """
    reduce_axes = tuple(range(gt.ndim - 2, gt.ndim))
    m = mask.astype(jnp.float32)
    count = jnp.sum(m, axis=reduce_axes)
    valid = (count > 0).astype(jnp.float32)
    cnt = jnp.maximum(count, 1.0)

    safe_gt = jnp.where(mask, gt, 1.0)
    safe_pred = jnp.where(mask, pred, 1.0)

    def mmean(x):
        return jnp.sum(x * m, axis=reduce_axes) / cnt

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    d1 = mmean(thresh < 1.25)
    d2 = mmean(thresh < 1.25**2)
    d3 = mmean(thresh < 1.25**3)

    diff = safe_gt - safe_pred
    rms = jnp.sqrt(mmean(diff**2))
    log_diff = jnp.log(safe_gt) - jnp.log(safe_pred)
    log_rms = jnp.sqrt(mmean(log_diff**2))

    abs_rel = mmean(jnp.abs(diff) / safe_gt)
    sq_rel = mmean(diff**2 / safe_gt)

    err = jnp.log(safe_pred) - jnp.log(safe_gt)
    silog = jnp.sqrt(jnp.maximum(mmean(err**2) - mmean(err) ** 2, 0.0)) * 100

    log10 = mmean(jnp.abs(jnp.log10(safe_pred) - jnp.log10(safe_gt)))

    metrics = jnp.stack(
        [silog, abs_rel, log10, rms, sq_rel, log_rms, d1, d2, d3], axis=-1
    )
    return metrics * valid[..., None], valid
