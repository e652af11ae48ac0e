"""Offline eval: checkpoint-directory watcher with an idempotency ledger.

Reference: pytorch/bts_eval.py:112-232 and tensorflow/bts_eval.py:104-335 —
enumerate model-* checkpoints, skip steps recorded in the
'evaluated_checkpoints' ledger, evaluate each against gt, log TensorBoard
scalars per step, append the ledger. The TF twin adds a checkpoint-maturity
guard (skip if mtime < 60s, tensorflow/bts_eval.py:143-150) — included here.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

from bts_tpu.config import Config
from bts_tpu.evaluation.metrics import EVAL_METRICS
from bts_tpu.evaluation.online import run_online_eval
from bts_tpu.training.checkpoint import list_step_checkpoints

LEDGER_NAME = "evaluated_checkpoints"


def read_ledger(ckpt_dir: str) -> List[int]:
    path = os.path.join(ckpt_dir, LEDGER_NAME)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [int(l) for l in f.read().split() if l.strip()]


def append_ledger(ckpt_dir: str, step: int) -> None:
    with open(os.path.join(ckpt_dir, LEDGER_NAME), "a") as f:
        f.write(f"{step}\n")


def pending_checkpoints(
    ckpt_dir: str, maturity_secs: float = 60.0
) -> Dict[int, str]:
    """Checkpoints not yet evaluated and older than maturity_secs."""
    done = set(read_ledger(ckpt_dir))
    now = time.time()
    out = {}
    for step, path in sorted(list_step_checkpoints(ckpt_dir).items()):
        if step in done:
            continue
        if now - os.path.getmtime(path) < maturity_secs:
            continue  # TF maturity guard (tensorflow/bts_eval.py:143-150)
        out[step] = path
    return out


def evaluate_pending(
    cfg: Config,
    ckpt_dir: Optional[str] = None,
    maturity_secs: float = 60.0,
    writer=None,
) -> Dict[int, np.ndarray]:
    """Evaluate all pending checkpoints; returns {step: measures}."""
    import jax

    from bts_tpu.models.bts import create_model, init_model
    from bts_tpu.training.checkpoint import load_any_checkpoint

    ckpt_dir = ckpt_dir or os.path.join(cfg.log_directory, cfg.model_name)
    pending = pending_checkpoints(ckpt_dir, maturity_secs)
    if not pending:
        return {}

    model = create_model(cfg)
    params, stats = init_model(
        model,
        jax.random.key(cfg.seed),
        (1, cfg.input_height, cfg.input_width, 3),
    )
    results = {}
    for step, path in pending.items():
        p, s = load_any_checkpoint(path, params, stats, cfg=cfg)
        measures = run_online_eval(
            model, {"params": p, "batch_stats": s}, cfg
        )
        if measures is None:
            continue
        results[step] = measures
        if writer is not None:
            for i, name in enumerate(EVAL_METRICS):
                writer.add_scalar(name, float(measures[i]), step)
            writer.flush()
        append_ledger(ckpt_dir, step)
    return results
