"""Evaluation masking / cropping protocol.

Reference: pytorch/bts_main.py:267-295, pytorch/bts_eval.py:261-289,
utils/eval_with_pngs.py:177-207 — prediction clamping, validity mask, the
garg / eigen crops, and kb-crop re-embedding.
"""

from __future__ import annotations

import numpy as np


def clamp_prediction(
    pred: np.ndarray, min_depth_eval: float, max_depth_eval: float
) -> np.ndarray:
    """Clamp pred to [min,max]; inf -> max, nan -> min.

    Reference: pytorch/bts_main.py:275-278.
    """
    pred = pred.copy()
    pred[np.isinf(pred)] = max_depth_eval
    pred[np.isnan(pred)] = min_depth_eval
    pred[pred < min_depth_eval] = min_depth_eval
    pred[pred > max_depth_eval] = max_depth_eval
    return pred


def kb_crop_reembed(pred: np.ndarray, gt_height: int, gt_width: int) -> np.ndarray:
    """Re-embed a 1216x352 kb-cropped prediction into a full-size zero canvas.

    Reference: pytorch/bts_main.py:267-273.
    """
    top_margin = int(gt_height - 352)
    left_margin = int((gt_width - 1216) / 2)
    out = np.zeros((gt_height, gt_width), dtype=np.float32)
    out[top_margin : top_margin + 352, left_margin : left_margin + 1216] = pred
    return out


def eval_mask(
    gt: np.ndarray,
    min_depth_eval: float,
    max_depth_eval: float,
    dataset: str = "nyu",
    garg_crop: bool = False,
    eigen_crop: bool = False,
) -> np.ndarray:
    """Validity mask: gt in (min, max), intersected with the chosen crop.

    Reference: pytorch/bts_main.py:280-295. NYU eigen_crop is the fixed
    region [45:471, 41:601]; KITTI crops are ratios of gt size.
    """
    valid = np.logical_and(gt > min_depth_eval, gt < max_depth_eval)
    if garg_crop or eigen_crop:
        gt_height, gt_width = gt.shape
        crop_mask = np.zeros(valid.shape, dtype=bool)
        if garg_crop:
            crop_mask[
                int(0.40810811 * gt_height) : int(0.99189189 * gt_height),
                int(0.03594771 * gt_width) : int(0.96405229 * gt_width),
            ] = True
        elif eigen_crop:
            if dataset == "kitti":
                crop_mask[
                    int(0.3324324 * gt_height) : int(0.91351351 * gt_height),
                    int(0.0359477 * gt_width) : int(0.96405229 * gt_width),
                ] = True
            else:
                crop_mask[45:471, 41:601] = True
        valid = np.logical_and(valid, crop_mask)
    return valid


def prepare_pred_gt(
    pred: np.ndarray,
    gt: np.ndarray,
    min_depth_eval: float,
    max_depth_eval: float,
    dataset: str = "nyu",
    do_kb_crop: bool = False,
    garg_crop: bool = False,
    eigen_crop: bool = False,
):
    """Full protocol: kb re-embed -> clamp -> mask. Returns (pred, gt, mask)."""
    pred = np.asarray(pred, dtype=np.float32).squeeze()
    gt = np.asarray(gt, dtype=np.float32).squeeze()
    if do_kb_crop and pred.shape != gt.shape:
        pred = kb_crop_reembed(pred, gt.shape[0], gt.shape[1])
    pred = clamp_prediction(pred, min_depth_eval, max_depth_eval)
    mask = eval_mask(
        gt, min_depth_eval, max_depth_eval, dataset, garg_crop, eigen_crop
    )
    return pred, gt, mask
