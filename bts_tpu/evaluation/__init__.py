"""Evaluation subsystem: metrics, masking protocol, online/offline eval."""

from bts_tpu.evaluation.metrics import compute_errors, EVAL_METRICS  # noqa: F401
