"""The training driver.

Reference behaviors covered (pytorch/bts_main.py:322-604):
  * model build + decoder xavier init (flax default is lecun; we use xavier
    to match weights_init_xavier, pytorch/bts_main.py:338) via flax's
    variance-scaling defaults on Conv — replicated in layers.Conv.
  * AdamW param groups + set_misc freezing (training/optim.py),
  * checkpoint restore / --retrain (training/checkpoint.py),
  * per-epoch sampler reshuffle (loader.epoch(epoch)),
  * jitted train step over the mesh (training/state.py),
  * console logging with loss/lr/examples-per-sec/var-sum + time-left
    estimates (pytorch/bts_main.py:462-480),
  * NaN-loss abort (pytorch/bts_main.py:464-466),
  * TensorBoard scalars + colorized image panels (pytorch/bts_main.py:482-496),
  * periodic checkpointing and online eval with per-metric best retention
    (pytorch/bts_main.py:498-544).
"""

from __future__ import annotations

import os
import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.config import Config
from bts_tpu.data.loader import EvalLoader, TrainLoader
from bts_tpu.evaluation.metrics import EVAL_METRICS
from bts_tpu.evaluation.online import make_eval_forward, run_online_eval
from bts_tpu.models.bts import create_model, init_model
from bts_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from bts_tpu.training import checkpoint as ckpt_lib
from bts_tpu.training.optim import advance_schedule_count, create_optimizer
from bts_tpu.training.snapshot import snapshot_run
from bts_tpu.training.state import (
    create_train_state,
    jit_train_step,
    make_train_step,
)


class TrainLogger:
    """Console + TensorBoard logging (rank-0 gated)."""

    def __init__(self, cfg: Config, run_dir: str, enabled: bool):
        self.cfg = cfg
        self._normalization = cfg.resolved_normalization  # resolved once
        self.enabled = enabled
        self.writer = None
        self.eval_writer = None
        if enabled and run_dir:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(
                    os.path.join(run_dir, "summaries"), flush_secs=30
                )
                if cfg.do_online_eval:
                    eval_dir = (
                        os.path.join(cfg.eval_summary_directory, cfg.model_name)
                        if cfg.eval_summary_directory
                        else os.path.join(cfg.log_directory or ".", "eval")
                    )
                    self.eval_writer = SummaryWriter(eval_dir, flush_secs=30)
            except Exception:
                pass

    def scalars(self, step: int, loss: float, lr: float, var_avg: float):
        if self.writer is not None:
            self.writer.add_scalar("silog_loss", loss, step)
            self.writer.add_scalar("learning_rate", lr, step)
            self.writer.add_scalar("var average", var_avg, step)
            self.writer.flush()

    def images(self, step: int, batch, outs):
        """Inverse-depth image panels (pytorch/bts_main.py:487-495)."""
        if self.writer is None:
            return
        from bts_tpu.data.transforms import denormalize_image
        from bts_tpu.utils.colorize import normalize_result

        lpg8, lpg4, lpg2, reduc1, depth_est = outs
        depth_gt = np.asarray(batch["depth"])
        depth_gt = np.where(depth_gt < 1e-3, 1e3, depth_gt)
        n = min(self.cfg.batch_size, depth_gt.shape[0])
        for i in range(n):
            self.writer.add_image(
                f"depth_gt/image/{i}", normalize_result(1.0 / depth_gt[i]), step
            )
            self.writer.add_image(
                f"depth_est/image/{i}",
                normalize_result(1.0 / np.asarray(depth_est[i])),
                step,
            )
            self.writer.add_image(
                f"reduc1x1/image/{i}",
                normalize_result(1.0 / np.maximum(np.asarray(reduc1[i]), 1e-6)),
                step,
            )
            for name, arr in (("lpg2x2", lpg2), ("lpg4x4", lpg4), ("lpg8x8", lpg8)):
                self.writer.add_image(
                    f"{name}/image/{i}",
                    normalize_result(1.0 / np.maximum(np.asarray(arr[i]), 1e-6)),
                    step,
                )
            img = denormalize_image(
                np.asarray(batch["image"][i]), self._normalization
            )
            self.writer.add_image(
                f"image/image/{i}", np.clip(img, 0, 1).transpose(2, 0, 1), step
            )
        self.writer.flush()

    def eval_scalars(self, step: int, measures: np.ndarray):
        if self.eval_writer is not None:
            for i, name in enumerate(EVAL_METRICS):
                self.eval_writer.add_scalar(name, float(measures[i]), step)
            self.eval_writer.flush()

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.eval_writer is not None:
            self.eval_writer.close()


@jax.jit
def _param_sum_avg_device(params):
    leaves = jax.tree.leaves(params)
    total = sum(jnp.sum(p.astype(jnp.float32)) for p in leaves)
    return total / max(len(leaves), 1)


def param_sum_avg(params) -> float:
    # One fused device reduction + a single scalar readback (a per-leaf
    # float() loop costs ~700 tiny D2H syncs over the ~30ms-latency tunnel).
    return float(_param_sum_avg_device(params))


def restore_training_start(cfg: Config, state, best, is_primary: bool):
    """Apply --checkpoint_path (and --retrain) to a fresh train state.
    Returns (state, best).

    Three accepted formats (mirrors checkpoint.load_any_checkpoint):
      * an orbax run directory saved by this framework — full resume
        (params, optimizer state, step, best-metric state; the PT
        reference's semantics, pytorch/bts_main.py:376-397);
      * a reference TF checkpoint prefix/dir — weights + global_step carry
        over (the TF reference's Saver.restore resume,
        tensorflow/bts_main.py:234-246);
      * a reference torch checkpoint file — weights, plus global_step and
        the best-eval tracker when the dict carries them
        (pytorch/bts_main.py:376-397 restores all three; trainer saves do,
        zoo releases and bare state dicts don't).
    For both reference formats the optimizer MOMENTS start fresh (TF/torch
    Adam slots have no optax mapping) but the LR schedule is advanced to
    the restored step, matching the references' global_step-keyed decay.
    Anything else raises instead of silently training from scratch.
    """
    from bts_tpu.models import convert_tf

    if not cfg.checkpoint_path:
        pass
    elif os.path.isdir(cfg.checkpoint_path) and not convert_tf.is_tf_checkpoint(
        cfg.checkpoint_path
    ):
        state, restored_best = ckpt_lib.restore_checkpoint(
            cfg.checkpoint_path, state, best
        )
        if restored_best is not None:
            best = restored_best
        if is_primary:
            print(
                f"Loaded checkpoint '{cfg.checkpoint_path}' "
                f"(global_step {int(state.step)})"
            )
    else:
        # Reference TF prefix/dir or torch file — or a missing path, which
        # load_any_checkpoint rejects loudly. One dispatch for all formats.
        new_p, new_s, meta = ckpt_lib.load_any_checkpoint(
            cfg.checkpoint_path,
            state.params,
            state.batch_stats,
            cfg=cfg,
            return_meta=True,
        )
        step = int(meta.get("global_step", 0))
        state = state.replace(
            params=new_p,
            batch_stats=new_s,
            step=jnp.asarray(step, jnp.int32),
            # The poly LR must continue from the restored step (both
            # references key it on global_step); the fresh optax schedule
            # would otherwise silently restart at base_lr while the logs
            # print the decayed one.
            opt_state=advance_schedule_count(state.opt_state, step),
        )
        if meta.get("best") is not None:
            best = ckpt_lib.BestTracker.from_dict(meta["best"])
        if is_primary:
            print(
                f"Loaded weights from '{cfg.checkpoint_path}' "
                f"(global_step {step}; fresh optimizer moments)"
            )
    if cfg.retrain:
        # --retrain restarts from step zero (pytorch/bts_main.py:399-400).
        # The LR schedule resets WITH the step: a restored/advanced
        # schedule count would otherwise keep the applied LR at its decayed
        # value (often end_lr) while the logged decay restarts at base_lr.
        state = state.replace(
            step=jnp.zeros((), jnp.int32),
            opt_state=advance_schedule_count(state.opt_state, 0),
        )
    return state, best


def train(cfg: Config, max_steps: Optional[int] = None) -> int:
    """Run training. Returns final global step, or -1 on NaN abort
    (reference contract, pytorch/bts_main.py:464-466)."""
    nproc, pidx = jax.process_count(), jax.process_index()
    is_primary = pidx == 0

    run_dir = snapshot_run(cfg) if is_primary and cfg.log_directory else ""

    mesh = make_mesh(cfg.num_devices, cfg.mesh_axis_name)
    model = create_model(cfg)
    params, batch_stats = init_model(
        model,
        jax.random.key(cfg.seed),
        (cfg.batch_size, cfg.input_height, cfg.input_width, 3),
    )

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if is_primary:
        print(f"Total number of parameters: {n_params}")

    if cfg.pretrained_model:
        # Partial warm-start by name intersection (the TF-side
        # --pretrained_model behavior, tensorflow/bts_main.py:228-232).
        # Accepts either a torch checkpoint (zoo / torchvision ImageNet) or
        # a reference-style TF checkpoint (ImageNet slim DenseNet).
        from bts_tpu.models import convert_tf

        if convert_tf.is_tf_checkpoint(cfg.pretrained_model):
            path = cfg.pretrained_model
            latest = convert_tf.tf_latest_checkpoint(path)
            tf_vars = convert_tf.load_tf_checkpoint(latest or path)
            # Same dispatch as is_full_tf_bts_checkpoint, but on the
            # in-memory variable map — no second disk walk of the index.
            if any("decoder/Conv/" in n for n in tf_vars):
                # Full trained TF BTS model (encoder + decoder): strict
                # conversion; cfg.resolved_flavor already built the model
                # as flavor='tf' so the bias leaves exist.
                params, batch_stats, report = convert_tf.convert_full_tf(
                    tf_vars, params, batch_stats, cfg.encoder, cfg.bts_size
                )
                if is_primary:
                    print(
                        f"Loaded full TF BTS checkpoint "
                        f"'{cfg.pretrained_model}' "
                        f"({len(report['loaded'])} tensors)"
                    )
            else:
                params, batch_stats, report = convert_tf.warm_start_from_tf(
                    tf_vars, params, batch_stats, cfg.encoder
                )
                if is_primary:
                    for name in report["unmatched_checkpoint"]:
                        # Reference wording: tensorflow/bts_main.py:119.
                        print(
                            f"{name} is in pretrained model but not in "
                            "current training model"
                        )
                    print(
                        f"Warm-started {len(report['loaded'])} tensors from "
                        f"TF checkpoint '{cfg.pretrained_model}'"
                    )
        else:
            from bts_tpu.models.convert import (
                convert_state_dict,
                load_torch_checkpoint,
            )

            torch_state = load_torch_checkpoint(cfg.pretrained_model)
            params, batch_stats = convert_state_dict(
                torch_state, params, batch_stats, strict=False
            )
            if is_primary:
                print(f"Warm-started from '{cfg.pretrained_model}'")

    loader = TrainLoader(cfg, num_shards=nproc, shard_index=pidx)
    steps_per_epoch = loader.steps_per_epoch()
    num_total_steps = cfg.num_epochs * steps_per_epoch

    tx, schedule = create_optimizer(cfg, params, num_total_steps)
    state = create_train_state(params, batch_stats, tx)
    best = ckpt_lib.BestTracker()

    # Restore (pytorch/bts_main.py:376-397); --retrain resets step + LR
    # schedule (both handled inside restore_training_start).
    state, best = restore_training_start(cfg, state, best, is_primary)

    # Commit the (possibly restored) state to the mesh before step 0 —
    # otherwise step 1 and step 2 see different avals and the train step
    # XLA-compiles twice (see mesh.replicate_tree).
    state = replicate_tree(state, mesh)

    train_step = jit_train_step(make_train_step(model, tx, cfg), mesh,
                                cfg.mesh_axis_name)

    eval_loader = None
    eval_forward = None
    if cfg.do_online_eval:
        eval_loader = EvalLoader(
            cfg, "online_eval", num_shards=nproc, shard_index=pidx
        )
        eval_forward = make_eval_forward(model)

    logger = TrainLogger(cfg, run_dir, enabled=is_primary)

    # LR for logging is computed on the host — calling the jnp schedule
    # eagerly would dispatch + sync a tiny device computation every step.
    from bts_tpu.training.lr import polynomial_decay_host

    host_lr = polynomial_decay_host(
        cfg.learning_rate,
        cfg.resolved_end_learning_rate,
        num_total_steps,
        power=0.9,
    )
    del schedule  # device-side twin lives inside the optimizer

    global_step = int(state.step)
    epoch = global_step // max(steps_per_epoch, 1)
    start_time = time.time()
    duration = 0.0
    model_just_loaded = bool(cfg.checkpoint_path)
    profiling = False

    # ---- Pipelined readback -------------------------------------------
    # The hot loop dispatches step N, then reads back step N-3's loss — a
    # delayed sync (same pattern as bench.py). Over the axon tunnel a
    # same-step readback costs ~30ms of dead time per step, and a depth-1
    # pipeline still leaves ~20ms of dispatch gap; depth 3 was measured to
    # close the gap to device-busy time exactly (scripts/bench_train.py
    # --delay). The NaN abort operates on the delayed value (a few steps
    # late, same -1 contract as pytorch/bts_main.py:464-466).
    from collections import deque

    pipeline_depth = 3
    pending = deque()  # info dicts for steps whose loss we haven't read yet
    panel_forward = None

    def process_pending(p) -> bool:
        """Read back + log step p. Returns False on NaN (abort)."""
        nonlocal panel_forward
        loss = float(p["metrics"]["loss"])
        if is_primary:
            print(
                f"[epoch][s/s_per_e/gs]: [{p['epoch']}][{p['sie']}"
                f"/{steps_per_epoch}/{p['gs']}], lr: {p['lr']:.12f}, "
                f"loss: {loss:.12f}"
            )
            if np.isnan(loss):
                print("NaN in loss occurred. Aborting training.")
                return False
        if p["log"]:
            var_avg = param_sum_avg(state.params)
            examples_per_sec = (
                cfg.batch_size / p["duration"] * cfg.log_freq
                if p["duration"]
                else 0.0
            )
            time_sofar = (time.time() - start_time) / 3600
            training_time_left = (
                num_total_steps / max(p["gs"], 1) - 1.0
            ) * time_sofar
            if is_primary:
                print(cfg.model_name)
                print(
                    f"examples/s: {examples_per_sec:4.2f} | loss: {loss:.5f} "
                    f"| var avg: {var_avg:.3f} | time elapsed: "
                    f"{time_sofar:.2f}h | time left: {training_time_left:.2f}h"
                )
                logger.scalars(p["gs"], loss, p["lr"], var_avg)
                if logger.writer is not None and p["device_batch"] is not None:
                    # Image panels every log_freq (pytorch/bts_main.py:482-496).
                    if panel_forward is None:
                        from bts_tpu.training.state import make_panel_forward

                        panel_forward = make_panel_forward(model, cfg)
                    outs, img, dpt = panel_forward(
                        state.params,
                        state.batch_stats,
                        p["device_batch"],
                        p["gs"] - 1,
                    )
                    logger.images(
                        p["gs"],
                        {"image": np.asarray(img), "depth": np.asarray(dpt)},
                        [np.asarray(o) for o in outs],
                    )
        return True

    # Preemption safety (TPU-native; SURVEY.md §5.3 — the reference has
    # none): cloud TPU eviction delivers SIGTERM with a grace window; latch
    # it and checkpoint + exit cleanly at the next step boundary.
    from bts_tpu.training.preempt import PreemptionGuard

    preempt_guard = PreemptionGuard(
        signals=(signal.SIGTERM,) if cfg.preempt_checkpoint else ()
    )
    preempt_guard.__enter__()

    def finish(rv: int) -> int:
        if profiling:
            jax.profiler.stop_trace()
        preempt_guard.__exit__(None, None, None)
        # Commit any in-flight async checkpoint before returning control
        # (callers may immediately read the checkpoint back, e.g. tests
        # and the train->test->eval CLI chain).
        ckpt_lib.wait_for_async_saves()
        logger.close()
        return rv

    try:
        while epoch < cfg.num_epochs:
            for batch in loader.epoch(epoch):
                # Profiling window (SURVEY.md §5.1 — TPU-native tracing).
                if cfg.profile_steps and is_primary:
                    if global_step == 10 and not profiling:
                        jax.profiler.start_trace(cfg.profile_dir)
                        profiling = True
                    elif profiling and global_step >= 10 + cfg.profile_steps:
                        jax.profiler.stop_trace()
                        profiling = False
                        print(f"Profiler trace written to {cfg.profile_dir}")
                t0 = time.time()
                device_batch = shard_batch(
                    {k: batch[k] for k in ("image", "depth", "focal")},
                    mesh,
                    cfg.mesh_axis_name,
                )
                state, metrics = train_step(state, device_batch)
                global_step += 1

                will_log = (
                    global_step % cfg.log_freq == 0 and not model_just_loaded
                )
                this_step = {
                    "gs": global_step,
                    "epoch": epoch,
                    "sie": (global_step - 1) % steps_per_epoch,
                    "lr": host_lr(global_step),
                    "metrics": metrics,
                    "log": will_log,
                    # Keep the batch alive only when panels will be rendered.
                    # Panels render with the CURRENT params when processed, so
                    # with pipeline depth 3 a panel can be up to 3 optimizer
                    # steps newer than its labeled step — acceptable skew.
                    "device_batch": device_batch if will_log else None,
                    "duration": 0.0,
                }

                pending.append(this_step)
                pipeline_ok = len(pending) <= pipeline_depth or process_pending(
                    pending.popleft()
                )
                # Accumulate wall time AFTER the delayed readback so the logged
                # examples/s reflects real throughput, not dispatch-only time
                # (the blocking float(loss) wait is the device-bound majority of
                # per-step time in the pipelined loop). this_step is safe to
                # mutate post-append: with depth>=1 it pops on a later iteration.
                duration += time.time() - t0
                if will_log:
                    this_step["duration"] = duration
                    duration = 0.0
                if not pipeline_ok:
                    return finish(-1)

                will_save = (
                    not cfg.do_online_eval
                    and global_step % cfg.save_freq == 0
                    and is_primary
                    and run_dir
                )
                will_eval = (
                    cfg.do_online_eval
                    and global_step % cfg.eval_freq == 0
                    and not model_just_loaded
                )
                if will_save or will_eval:
                    # These blocks synchronize on the full state anyway; flush
                    # the delayed readbacks first so logs stay in step order.
                    while pending:
                        if not process_pending(pending.popleft()):
                            return finish(-1)

                if (
                    not cfg.do_online_eval
                    and global_step % cfg.save_freq == 0
                    and is_primary
                    and run_dir
                ):
                    ckpt_lib.save_checkpoint(
                        os.path.join(run_dir, f"model-{global_step}"),
                        state,
                        best,
                        async_save=cfg.async_checkpoint,
                    )
                    ckpt_lib.prune_step_checkpoints(run_dir, cfg.max_to_keep)

                if (
                    cfg.do_online_eval
                    and global_step % cfg.eval_freq == 0
                    and not model_just_loaded
                ):
                    variables = {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                    }
                    measures = run_online_eval(
                        model, variables, cfg, eval_loader, eval_forward
                    )
                    if measures is not None and is_primary:
                        logger.eval_scalars(global_step, measures)
                        improved = best.update(measures, global_step)
                        for mi, old_step, old_val in improved:
                            metric = EVAL_METRICS[mi]
                            if run_dir:
                                ckpt_lib.remove_old_best(
                                    run_dir, old_step, metric, old_val
                                )
                                name = ckpt_lib.best_checkpoint_name(
                                    global_step, metric, float(measures[mi])
                                )
                                print(f"New best for {metric}. Saving model: {name}")
                                ckpt_lib.save_checkpoint(
                                    os.path.join(run_dir, name),
                                    state,
                                    best,
                                    async_save=cfg.async_checkpoint,
                                )

                model_just_loaded = False
                if preempt_guard.requested:
                    while pending:
                        if not process_pending(pending.popleft()):
                            return finish(-1)
                    if is_primary and run_dir:
                        print(
                            "Termination signal received; saving checkpoint "
                            f"model-{global_step} and exiting cleanly."
                        )
                        # save_checkpoint drains in-flight async saves
                        # before its rmtree (a periodic async save to the
                        # same model-{step} path may still be writing).
                        ckpt_lib.save_checkpoint(
                            os.path.join(run_dir, f"model-{global_step}"),
                            state,
                            best,
                        )
                    return finish(global_step)
                if max_steps is not None and global_step >= max_steps:
                    while pending:
                        if not process_pending(pending.popleft()):
                            return finish(-1)
                    return finish(global_step)
            epoch += 1

        while pending:
            if not process_pending(pending.popleft()):
                return finish(-1)
        return finish(global_step)
    finally:
        # Always restore the SIGTERM handler, even when the loop
        # raises (loader IO error, OOM, ...) — a leaked handler
        # latching into a dead guard would swallow later SIGTERMs
        # for the rest of the process. __exit__ is idempotent, so
        # the finish() path restoring first is fine.
        preempt_guard.__exit__(None, None, None)
