"""Preemption-safe checkpointing (SIGTERM -> save + clean exit).

TPU-native addition; SURVEY.md §5.3 records that the reference has no
preemption handling (recovery = manual resume from the last periodic
checkpoint, pytorch/bts_main.py:376-400)."""

import os
import signal
import threading

from bts_tpu.training.preempt import PreemptionGuard


def test_guard_latches_sigterm_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)
        # Signal delivery to the main thread is synchronous at the next
        # interpreter checkpoint; the flag must be set by now.
        assert guard.requested
        assert guard.signal_received == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is before


def test_guard_empty_signals_is_inert():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard(signals=()) as guard:
        assert not guard.requested
        assert signal.getsignal(signal.SIGTERM) is before


def test_guard_degrades_off_main_thread():
    results = {}

    def worker():
        with PreemptionGuard() as guard:
            results["requested"] = guard.requested

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    # No crash, flag simply stays unset (handlers need the main thread).
    assert results["requested"] is False


def test_train_restores_handler_when_loop_raises(tmp_path, monkeypatch):
    """An exception inside the train loop must not leak the SIGTERM
    handler (a dead guard would swallow later SIGTERMs process-wide)."""
    import numpy as np
    import pytest
    from PIL import Image

    from bts_tpu.config import Config
    from bts_tpu.data import loader as loader_mod
    from bts_tpu.training.loop import train

    root = tmp_path / "data"
    scene = root / "s1"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(2)
    Image.fromarray(
        rng.integers(0, 255, size=(64, 128, 3), dtype=np.uint8)
    ).save(scene / "rgb_00000.jpg")
    Image.fromarray(
        rng.integers(500, 9000, size=(64, 128), dtype=np.uint16)
    ).save(scene / "sync_depth_00000.png")
    (root / "train.txt").write_text(
        "s1/rgb_00000.jpg s1/sync_depth_00000.png 518.8579\n"
    )

    def boom(self, epoch):
        raise RuntimeError("loader exploded")

    monkeypatch.setattr(loader_mod.TrainLoader, "epoch", boom)
    cfg = Config(
        encoder="mobilenetv2_bts",
        dataset="nyu",
        max_depth=10.0,
        batch_size=1,
        input_height=32,
        input_width=64,
        bts_size=128,
        data_path=str(root),
        gt_path=str(root),
        filenames_file=str(root / "train.txt"),
        num_epochs=1,
    )
    before = signal.getsignal(signal.SIGTERM)
    with pytest.raises(RuntimeError, match="loader exploded"):
        train(cfg)
    assert signal.getsignal(signal.SIGTERM) is before
