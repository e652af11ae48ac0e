"""TrainLogger TensorBoard panels + continuous-eval scheduler smoke tests."""

import os

import numpy as np

from bts_tpu.config import Config
from bts_tpu.utils.colorize import colorize, normalize_result


def test_colorize_and_normalize():
    depth = np.random.default_rng(0).uniform(0.5, 10, size=(16, 20))
    img = colorize(depth, cmap="Greys")
    assert img.shape == (3, 16, 20) and img.dtype == np.uint8
    norm = normalize_result(depth[None])
    assert norm.shape == (1, 16, 20)
    assert norm.min() >= 0 and norm.max() <= 1


def test_train_logger_writes_events(tmp_path):
    from bts_tpu.training.loop import TrainLogger

    cfg = Config(batch_size=2, do_online_eval=True, log_directory=str(tmp_path))
    logger = TrainLogger(cfg, str(tmp_path / "run"), enabled=True)
    logger.scalars(10, loss=1.5, lr=1e-4, var_avg=0.3)

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(2, 16, 20, 3)).astype(np.float32),
        "depth": rng.uniform(0.5, 9, size=(2, 16, 20, 1)).astype(np.float32),
    }
    outs = [rng.uniform(0.05, 1, size=(2, 16, 20, 1)).astype(np.float32)
            for _ in range(4)]
    outs.append(rng.uniform(0.5, 10, size=(2, 16, 20, 1)).astype(np.float32))
    logger.images(10, batch, outs)
    logger.eval_scalars(10, np.linspace(0.1, 0.9, 9))
    logger.close()

    event_files = []
    for root, _, files in os.walk(tmp_path):
        event_files += [f for f in files if "tfevents" in f]
    assert event_files, "no TensorBoard event files written"


def test_eval_schedule_bounded(tmp_path, monkeypatch):
    """run_schedule with max_iterations terminates and calls the evaluator."""
    from bts_tpu.evaluation import schedule

    calls = []

    def fake_evaluate(cfg, writer=None):
        calls.append(1)
        return {}

    monkeypatch.setattr(schedule, "evaluate_pending", fake_evaluate)
    cfg = Config(log_directory=str(tmp_path))
    schedule.run_schedule(cfg, interval_secs=0.01, max_iterations=3)
    assert len(calls) == 3
