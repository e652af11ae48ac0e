"""Training subsystem: loss, LR schedule, optimizer, state, loop."""

from bts_tpu.training.loss import silog_loss  # noqa: F401
from bts_tpu.training.lr import polynomial_decay  # noqa: F401
