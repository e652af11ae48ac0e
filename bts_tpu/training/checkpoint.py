"""Checkpoint / resume.

TPU-native equivalent (orbax) of the reference's torch.save dict
{global_step, model, optimizer, best_eval_measures_*, best_eval_steps}
(pytorch/bts_main.py:500-503,532-539) and restore (:376-397), including:

  * per-metric best-checkpoint retention with old-best deletion
    (pytorch/bts_main.py:513-539),
  * reference checkpoint naming: model-{step} and
    model-{step}-best_{metric}_{value:.5f},
  * --retrain resetting the step (pytorch/bts_main.py:399-400).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from bts_tpu.evaluation.metrics import (
    EVAL_METRICS,
    NUM_HIGHER_BETTER,
    NUM_LOWER_BETTER,
)

_BEST_RE = re.compile(r"model-(\d+)-best_(\w+)_([0-9.]+)$")
_STEP_RE = re.compile(r"model-(\d+)$")


class BestTracker:
    """Per-metric best-value tracking (6 lower-better + 3 higher-better)."""

    def __init__(self):
        self.lower = np.zeros(NUM_LOWER_BETTER) + 1e3
        self.higher = np.zeros(NUM_HIGHER_BETTER)
        self.steps = np.zeros(len(EVAL_METRICS), dtype=np.int64)

    def update(self, measures: np.ndarray, step: int):
        """Returns list of (metric_index, old_step, old_value) for new bests."""
        improved = []
        for i in range(len(EVAL_METRICS)):
            m = float(measures[i])
            if i < NUM_LOWER_BETTER:
                if m < self.lower[i]:
                    improved.append((i, int(self.steps[i]), float(self.lower[i])))
                    self.lower[i] = m
                    self.steps[i] = step
            else:
                j = i - NUM_LOWER_BETTER
                if m > self.higher[j]:
                    improved.append((i, int(self.steps[i]), float(self.higher[j])))
                    self.higher[j] = m
                    self.steps[i] = step
        return improved

    def to_dict(self) -> Dict[str, Any]:
        return {
            "best_eval_measures_lower_better": self.lower,
            "best_eval_measures_higher_better": self.higher,
            "best_eval_steps": self.steps,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BestTracker":
        t = cls()
        t.lower = np.asarray(d["best_eval_measures_lower_better"])
        t.higher = np.asarray(d["best_eval_measures_higher_better"])
        t.steps = np.asarray(d["best_eval_steps"])
        return t


def _ckpt_payload(state, best: Optional[BestTracker]) -> Dict[str, Any]:
    payload = {
        "global_step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    if best is not None:
        payload["best"] = best.to_dict()
    return payload


_async_ckptr: Optional["ocp.AsyncCheckpointer"] = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint save has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(
    path: str,
    state,
    best: Optional[BestTracker] = None,
    async_save: bool = False,
) -> None:
    """Save a full training checkpoint to `path` (a directory).

    async_save=True returns as soon as serialization is dispatched: orbax
    performs the device->host reads and file writes on a background thread
    while training continues (the torch analogue blocks the step loop for
    the whole torch.save, pytorch/bts_main.py:500-503). At most one save
    is in flight; a new save first waits for the previous one. Call
    wait_for_async_saves() before reading the checkpoint back or exiting.
    """
    path = os.path.abspath(path)
    if async_save:
        ckptr = _get_async_checkpointer()
        ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        # No jax.device_get: hand orbax the device arrays so the D2H
        # transfer itself happens on the background thread.
        payload = {
            "global_step": np.asarray(state.step),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        if best is not None:
            payload["best"] = best.to_dict()
        ckptr.save(path, payload)
        return
    # A prior async save to this path may still be writing in the
    # background: drain it before deleting the directory out from under
    # the writer (every sync caller gets the guard, not just the preempt
    # path in loop.py).
    wait_for_async_saves()
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _ckpt_payload(state, best))


def restore_checkpoint(path: str, state, best: Optional[BestTracker] = None):
    """Restore (state, best) from `path`, using `state` as the shape/dtype
    template (reference restore: pytorch/bts_main.py:376-397)."""
    path = os.path.abspath(path)
    template = _ckpt_payload(state, best)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    new_state = state.replace(
        step=jax.numpy.asarray(restored["global_step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    new_best = None
    if best is not None and "best" in restored:
        new_best = BestTracker.from_dict(restored["best"])
    return new_state, new_best


def save_params_only(path: str, params, batch_stats) -> None:
    """Inference checkpoint: params + batch stats only."""
    path = os.path.abspath(path)
    wait_for_async_saves()  # same rmtree-vs-background-writer guard
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "params": jax.device_get(params),
                "batch_stats": jax.device_get(batch_stats),
            },
        )


def load_params_only(path: str, template_params=None, template_stats=None):
    path = os.path.abspath(path)
    item = None
    if template_params is not None:
        item = {
            "params": template_params,
            "batch_stats": template_stats if template_stats is not None else {},
        }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=item)
    return restored["params"], restored.get("batch_stats", {})


def orbax_saved_tf_flavor(path: str) -> bool:
    """True when the orbax checkpoint at `path` was saved from a
    flavor='tf' model — detected structurally (the TF-flavor decoder
    declares conv bias leaves the PT decoder doesn't, models/decoder.py).
    Reads only the checkpoint METADATA, no tensor data. False for
    non-orbax paths or checkpoints without a params tree, so callers can
    probe blindly."""
    try:
        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(path)
        # orbax returns StepMetadata(item_metadata=TreeMetadata(tree=...));
        # unwrap defensively so older/newer orbax shapes both work.
        tree = getattr(meta, "item_metadata", meta)
        tree = getattr(tree, "tree", tree)
        return "bias" in tree["params"]["decoder"]["get_depth"]["conv"]
    except Exception:
        return False


def load_any_checkpoint(
    path: str,
    template_params=None,
    template_stats=None,
    cfg=None,
    return_meta: bool = False,
):
    """Load params/batch_stats from any supported checkpoint format:

      * an orbax directory saved by this framework (full-training or
        params-only),
      * a reference PyTorch zoo checkpoint (torch.save file,
        pytorch/bts_main.py:500-503) via models/convert.py,
      * a full reference TF BTS checkpoint (bts_nyu_v2/bts_eigen_v2,
        tensorflow/README.md:89,198) via models/convert_tf.convert_full_tf
        — requires templates + cfg, and the model must be built with
        flavor='tf' (cfg.resolved_flavor auto-selects it).

    With return_meta=True returns (params, stats, meta) where meta carries
    whatever training bookkeeping the checkpoint format offers:
    'global_step' (int) and 'best' (a BestTracker.from_dict-compatible
    dict), each present only when stored. This is the single place the
    3-format dispatch lives — train-mode resume (loop.restore_training_start)
    and the test/eval CLIs route through it.
    """
    from bts_tpu.models import convert_tf

    if convert_tf.is_tf_checkpoint(path):
        if template_params is None or cfg is None:
            raise ValueError(
                "loading a TF checkpoint needs model templates and cfg "
                "(encoder/bts_size drive the slim name mapping)"
            )
        latest = convert_tf.tf_latest_checkpoint(path)
        tf_vars = convert_tf.load_tf_checkpoint(latest or path)
        params, stats, _ = convert_tf.convert_full_tf(
            tf_vars, template_params, template_stats, cfg.encoder, cfg.bts_size
        )
        if not return_meta:
            return params, stats
        meta = {}
        if "global_step" in tf_vars:
            meta["global_step"] = int(tf_vars["global_step"])
        return params, stats, meta
    path = os.path.abspath(path)
    if os.path.isfile(path):
        # Reference torch checkpoint (zoo release or trainer save).
        if template_params is None:
            raise ValueError(
                "loading a torch checkpoint needs model templates"
            )
        from bts_tpu.models.convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        if not return_meta:
            return convert_state_dict(
                load_torch_checkpoint(path), template_params, template_stats
            )
        tensors, meta = load_torch_checkpoint(path, return_meta=True)
        params, stats = convert_state_dict(
            tensors, template_params, template_stats
        )
        return params, stats, meta
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"No checkpoint at '{path}'. Expected an orbax directory saved "
            f"by this framework (e.g. <log_directory>/<model_name>/"
            f"model-<step>), a reference torch .pth file, or a TF "
            f"checkpoint prefix."
        )
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    params = restored["params"]
    stats = restored.get("batch_stats", {}) or {}
    if not return_meta:
        return params, stats
    meta = {}
    if "global_step" in restored:
        meta["global_step"] = int(restored["global_step"])
    if restored.get("best") is not None:
        meta["best"] = restored["best"]
    return params, stats, meta


def average_checkpoints(paths):
    """Uniform parameter average of N checkpoints (SWA-style eval).

    Accepts full-training or params-only checkpoints; returns
    (params, batch_stats) host trees ready for save_params_only /
    inference. Float leaves are averaged in float64 then cast back;
    non-float leaves (none in this model) keep the first checkpoint's
    value. BN running stats are averaged too — the standard cheap
    approximation (exact SWA re-estimates them with a data pass; with
    bn_init_as_tf semantics the stats are frozen and identical anyway).

    No reference equivalent (the reference keeps per-metric best
    checkpoints, pytorch/bts_main.py:513-539); this composes with them:
    average the best-d1/best-rms/... snapshots and eval the result.
    """
    if not paths:
        raise ValueError("average_checkpoints: need at least one path")

    def add(a, b):
        b = np.asarray(b)
        # jnp.issubdtype (not np.) so extension floats (ml_dtypes.bfloat16)
        # are averaged rather than silently keeping the first checkpoint.
        if not jnp.issubdtype(b.dtype, jnp.floating):
            # Non-float leaves keep the first checkpoint's value.
            return b if a is None else a
        return b.astype(np.float64) if a is None else a + b

    acc_params = acc_stats = None
    for path in paths:
        params, stats = load_any_checkpoint(path)
        if acc_params is None:
            acc_params = jax.tree.map(lambda x: add(None, x), params)
            acc_stats = jax.tree.map(lambda x: add(None, x), stats)
            tmpl_params, tmpl_stats = params, stats
        else:
            acc_params = jax.tree.map(add, acc_params, params)
            acc_stats = jax.tree.map(add, acc_stats, stats)
    n = float(len(paths))

    def cast(a, t):
        t = np.asarray(t)
        if not jnp.issubdtype(t.dtype, jnp.floating):
            return a  # the retained first-checkpoint value
        return (a / n).astype(t.dtype)

    return (
        jax.tree.map(cast, acc_params, tmpl_params),
        jax.tree.map(cast, acc_stats, tmpl_stats),
    )


def best_checkpoint_name(step: int, metric: str, value: float) -> str:
    """Reference naming (pytorch/bts_main.py:530)."""
    return f"model-{step}-best_{metric}_{value:.5f}"


def remove_old_best(log_dir: str, step: int, metric: str, value: float) -> None:
    """Delete a superseded best checkpoint (pytorch/bts_main.py:524-528)."""
    path = os.path.join(log_dir, best_checkpoint_name(step, metric, value))
    if os.path.exists(path):
        shutil.rmtree(path)


def prune_step_checkpoints(log_dir: str, max_to_keep: int) -> None:
    """Keep only the newest max_to_keep 'model-{step}' checkpoints
    (tf.train.Saver(max_to_keep) behavior, tensorflow/bts_main.py:214).
    Best-metric checkpoints are never pruned."""
    if max_to_keep <= 0:
        return
    ckpts = list_step_checkpoints(log_dir)
    for step in sorted(ckpts)[:-max_to_keep]:
        shutil.rmtree(ckpts[step], ignore_errors=True)


def list_step_checkpoints(log_dir: str) -> Dict[int, str]:
    """Enumerate 'model-{step}' checkpoints (pytorch/bts_eval.py:120-137)."""
    out: Dict[int, str] = {}
    if not os.path.isdir(log_dir):
        return out
    for name in os.listdir(log_dir):
        m = _STEP_RE.match(name)
        if m:
            out[int(m.group(1))] = os.path.join(log_dir, name)
    return out
