"""Continuous-eval scheduler.

Reference: {pytorch,tensorflow}/run_bts_eval_schedule.py:19-47 — an
APScheduler loop shelling out to bts_eval every minute on a pinned GPU (the
"train on devices 1..N, eval on device 0" workflow). TPU-native version: a
plain interval loop calling evaluate_pending in-process (no scheduler
dependency, no subprocess); device pinning is a JAX platform/visible-devices
concern left to the caller's env.
"""

from __future__ import annotations

import time
import traceback

from bts_tpu.config import Config
from bts_tpu.evaluation.offline import evaluate_pending


def run_schedule(
    cfg: Config,
    interval_secs: float = 60.0,
    max_iterations: int = 0,
    writer=None,
) -> None:
    """Evaluate pending checkpoints every interval_secs. max_iterations=0
    runs forever (the reference's BlockingScheduler)."""
    i = 0
    while True:
        try:
            results = evaluate_pending(cfg, writer=writer)
            if results:
                print(f"Evaluated checkpoints: {sorted(results)}")
        except Exception:
            traceback.print_exc()
        i += 1
        if max_iterations and i >= max_iterations:
            return
        time.sleep(interval_secs)
