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
