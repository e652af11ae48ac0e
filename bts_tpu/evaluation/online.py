"""Online (in-training) evaluation.

Reference: pytorch/bts_main.py:250-319 — run the eval split, accumulate the
nine metric sums + a sample count, all-reduce across ranks, print the table.

TPU-native differences:
  * the model forward runs batched (cfg.eval_batch_size) under jit with a
    per-resolution compile cache, instead of eager batch-1;
  * the cross-rank all_reduce becomes a host-side sum + (multi-process)
    jax allreduce via multihost utils;
  * masking/cropping/metric math stays numpy, bit-matching the reference
    protocol (evaluation/protocol.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from bts_tpu.config import Config
from bts_tpu.data.loader import EvalLoader
from bts_tpu.evaluation.metrics import EVAL_METRICS, compute_errors
from bts_tpu.evaluation.protocol import prepare_pred_gt


def make_eval_forward(model, cache: Optional[dict] = None) -> Callable:
    """Batched jitted forward returning final depth (B,H,W); one compile per
    input resolution (the reference runs eager at any size,
    pytorch/bts_test.py:114-124). Inputs with H/W not divisible by the
    encoder stride (32) are edge-padded and the output cropped back."""
    cache = {} if cache is None else cache

    def forward(variables, image, focal):
        h, w = image.shape[1:3]
        ph, pw = (-h) % 32, (-w) % 32
        if ph or pw:
            image = np.pad(
                np.asarray(image), ((0, 0), (0, ph), (0, pw), (0, 0)),
                mode="edge",
            )
        key = image.shape
        if key not in cache:
            cache[key] = jax.jit(
                lambda v, im, f: model.apply(v, im, f, train=False)[4][..., 0]
            )
        out = cache[key](variables, image, focal)
        return out[:, :h, :w]

    return forward


def run_online_eval(
    model,
    variables,
    cfg: Config,
    loader: Optional[EvalLoader] = None,
    forward: Optional[Callable] = None,
    verbose: bool = True,
    process_info: Optional[tuple] = None,
    allgather_fn: Optional[Callable] = None,
) -> Optional[np.ndarray]:
    """Returns the 9 mean metrics (or None for non-primary processes).

    process_info=(nproc, pidx) and allgather_fn are injectable so the
    cross-process reduction path can be simulated (and its shard-composition
    math asserted) in single-process tests.
    """
    if process_info is not None:
        nproc, pidx = process_info
    else:
        nproc, pidx = jax.process_count(), jax.process_index()
    if loader is None:
        loader = EvalLoader(cfg, "online_eval", num_shards=nproc, shard_index=pidx)
    if forward is None:
        forward = make_eval_forward(model)

    use_device = bool(getattr(cfg, "device_eval", False))
    if use_device:
        from bts_tpu.evaluation.device_eval import make_batch_metrics, run_batch

        batch_metrics = make_batch_metrics(cfg)

    def score_host_sample(pred_i, gt):
        """Numpy-protocol scoring of one sample -> (sums9, 0/1)."""
        pred_sq = np.asarray(pred_i, np.float32).squeeze()
        gt_sq = np.asarray(gt, np.float32).squeeze()
        if pred_sq.shape != gt_sq.shape and not (
            cfg.do_kb_crop and pred_sq.shape == (352, 1216)
        ):
            # No defined protocol maps this pred onto this gt (the only
            # shape-bridging rule is the kb re-embed of a 352x1216 pred,
            # pytorch/bts_main.py:267-273). Exclude it LOUDLY — the
            # count in the final report stays exact for scored samples.
            import warnings

            warnings.warn(
                f"eval: cannot score sample with pred {pred_sq.shape} vs "
                f"gt {gt_sq.shape}; excluded from metrics",
                stacklevel=2,
            )
            return np.zeros(9, np.float64), 0
        pred, gt, mask = prepare_pred_gt(
            pred_i,
            gt,
            cfg.min_depth_eval,
            cfg.max_depth_eval,
            cfg.dataset,
            do_kb_crop=cfg.do_kb_crop,
            garg_crop=cfg.garg_crop,
            eigen_crop=cfg.eigen_crop,
        )
        if not mask.any():
            return np.zeros(9, np.float64), 0
        return compute_errors(gt[mask], pred[mask]), 1

    sums = np.zeros(9, dtype=np.float64)
    count = 0
    for batch in loader.batches():
        preds = forward(variables, batch["image"], batch["focal"])
        if use_device:
            # Batched on-device metrics: predictions stay on device, the
            # readback is a 10-float accumulator (TPU-native replacement
            # for the host loop + dist.all_reduce,
            # pytorch/bts_main.py:250-319).
            out = run_batch(batch_metrics, preds, batch, cfg.dataset)
            if out is not None:
                sums += out[0]
                count += int(round(out[1]))
                # Samples whose gt shape can't ride the batched kernel are
                # scored per-sample so every eval sample counts exactly
                # once (distributed_sampler_no_evenly_divisible.py:30-40).
                host_preds = np.asarray(preds) if out[2] else None
                for i in out[2]:
                    s, c = score_host_sample(
                        host_preds[i], batch["depths"][i]
                    )
                    sums += s
                    count += c
            continue
        preds = np.asarray(preds)
        for i, w in enumerate(batch["weight"]):
            if w == 0:
                continue
            gt = batch["depths"][i]
            if gt is None:
                continue  # missing gt tolerated (pytorch/bts_main.py:258-260)
            s, c = score_host_sample(preds[i], gt)
            sums += s
            count += c

    if nproc > 1:
        # Cross-process metric reduction — the reference's
        # dist.all_reduce(SUM) (pytorch/bts_main.py:302-304).
        if allgather_fn is None:
            from jax.experimental import multihost_utils

            allgather_fn = multihost_utils.process_allgather

        vec = np.concatenate([sums, [count]]).astype(np.float32)
        vec = np.asarray(allgather_fn(vec)).sum(axis=0)
        sums, count = vec[:9].astype(np.float64), int(round(float(vec[9])))

    if pidx != 0:
        return None
    measures = sums / max(count, 1)
    if verbose:
        print(f"Computing errors for {count} eval samples")
        print(
            ", ".join(f"{m:>7}" for m in EVAL_METRICS)
        )
        print(", ".join(f"{v:7.3f}" for v in measures))
    return measures
