"""On-device batched eval metrics.

TPU-native replacement for the reference's per-sample host metric loop +
dist.all_reduce (pytorch/bts_main.py:250-319): the model's predictions stay
on device, ground truth is uploaded once per batch as raw uint16 (half the
tunnel traffic of downloading f32 predictions), and masking, clamping and
the nine metrics all run in one jitted program whose only readback is a
10-float accumulator. The metric sums are psum-able across a mesh.

Semantics pinned to evaluation/protocol.py (the numpy reference path, kept
as the cross-check in tests):
  * clamp: inf -> max_depth_eval, nan -> min_depth_eval, clip to range
    (pytorch/bts_main.py:275-278);
  * validity: gt in (min, max) intersected with garg/eigen crops
    (pytorch/bts_main.py:280-295);
  * per-image metric means, summed over images with any valid pixel.

Online eval always sees pred.shape == gt.shape (the loader kb-crops gt the
same way it crops the image, pytorch/bts_dataloader.py:174-175), so no
re-embed is needed here — the kb re-embed only exists in the offline
PNG-vs-PNG path, which stays numpy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.evaluation.metrics import compute_errors_masked


def pack_gt_batch(depths, weights, dataset: str, pred_shape=None):
    """List of HW1 float-meter gt (or None) -> (B,H,W) uint16 raw batch.

    Depth values are k/1000 (NYU) or k/256 (KITTI) in f32, so the
    round-trip back to uint16 is exact — the device sees bit-identical
    meters after its own division. Samples with missing gt or weight 0
    become all-zero (invalid everywhere).

    Returns (raw, effective_weights, mismatched): `mismatched` lists the
    indices of real samples whose gt shape differs from the batch shape
    (pred_shape when given, else the first valid gt) — the batched kernel
    cannot score them, so the caller MUST score them per-sample (reference
    semantics: every eval sample counted exactly once,
    distributed_sampler_no_evenly_divisible.py:30-40). A loud warning is
    emitted so a heterogeneous dataset never undercounts silently.
    """
    scale = 1000.0 if dataset == "nyu" else 256.0
    arrs, eff, mismatched = [], [], []
    shape = tuple(pred_shape) if pred_shape is not None else None
    if shape is None:
        for d, w in zip(depths, weights):
            if d is not None and w > 0:
                shape = d.shape[:2]
                break
    if shape is None:
        return None, None, []
    for i, (d, w) in enumerate(zip(depths, weights)):
        if d is None or w == 0:
            arrs.append(np.zeros(shape, np.uint16))
            eff.append(0.0)
        elif d.shape[:2] != shape:
            arrs.append(np.zeros(shape, np.uint16))
            eff.append(0.0)
            mismatched.append(i)
        else:
            arrs.append(
                np.round(d[..., 0] * scale).astype(np.uint16)
            )
            eff.append(1.0)
    if mismatched:
        import warnings

        warnings.warn(
            f"device eval: {len(mismatched)} gt sample(s) with shape != "
            f"{shape} cannot ride the batched metric kernel; handing them "
            "to the per-sample host path (scored only if a shape-bridging "
            "protocol such as the kb-crop re-embed applies)",
            stacklevel=2,
        )
    return np.stack(arrs), np.asarray(eff, np.float32), mismatched


def make_batch_metrics(cfg):
    """Jitted (preds, gt_raw, weights) -> (metric_sums (9,), count ()).

    One compile per batch shape. preds may be a device array (no host
    round-trip); the readback is the 10-float accumulator only.
    """
    min_d = float(cfg.min_depth_eval)
    max_d = float(cfg.max_depth_eval)
    scale = 1000.0 if cfg.dataset == "nyu" else 256.0
    dataset = cfg.dataset
    garg_crop = bool(cfg.garg_crop)
    eigen_crop = bool(cfg.eigen_crop)

    def crop_mask(h: int, w: int):
        """Static crop rectangle (pytorch/bts_main.py:282-295)."""
        m = np.zeros((h, w), bool)
        if garg_crop:
            m[
                int(0.40810811 * h) : int(0.99189189 * h),
                int(0.03594771 * w) : int(0.96405229 * w),
            ] = True
        elif eigen_crop:
            if dataset == "kitti":
                m[
                    int(0.3324324 * h) : int(0.91351351 * h),
                    int(0.0359477 * w) : int(0.96405229 * w),
                ] = True
            else:
                m[45:471, 41:601] = True
        else:
            m[:] = True
        return m

    @jax.jit
    def batch_metrics(preds, gt_raw, weights):
        gt = gt_raw.astype(jnp.float32) / scale
        h, w = gt.shape[1:3]
        valid = (gt > min_d) & (gt < max_d)
        valid &= jnp.asarray(crop_mask(h, w))[None]
        valid &= (weights > 0)[:, None, None]

        pred = preds.astype(jnp.float32)
        pred = jnp.where(jnp.isinf(pred), max_d, pred)
        pred = jnp.where(jnp.isnan(pred), min_d, pred)
        pred = jnp.clip(pred, min_d, max_d)

        metrics, has_valid = compute_errors_masked(gt, pred, valid)
        return metrics.sum(axis=0), has_valid.sum()

    return batch_metrics


def run_batch(
    batch_metrics,
    preds,
    batch: dict,
    dataset: str,
) -> Optional[tuple]:
    """One eval batch through the device path. Returns
    (sums9, count, mismatched_indices) as host values, or None when the
    whole batch lacks usable gt. Mismatched-shape samples are NOT counted
    here — the caller scores them per-sample (see pack_gt_batch)."""
    # .shape on a jax array is metadata — no device-to-host transfer.
    gt_raw, eff, mismatched = pack_gt_batch(
        batch["depths"], batch["weight"], dataset,
        pred_shape=preds.shape[1:3],
    )
    if gt_raw is None:
        return None
    if not eff.any():
        # Nothing the batched kernel can score — skip the device round
        # trip; mismatched samples (if any) still go to the host path.
        if not mismatched:
            return None
        return np.zeros(9, np.float64), 0.0, mismatched
    sums, count = batch_metrics(preds, gt_raw, eff)
    return np.asarray(sums, np.float64), float(count), mismatched
