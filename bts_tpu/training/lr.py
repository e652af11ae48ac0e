"""Learning-rate schedules.

Reference: manual polynomial decay each step (pytorch/bts_main.py:456-458):
    lr = (lr0 - end_lr) * (1 - step/total)^0.9 + end_lr
and TF's tf.train.polynomial_decay(power=0.9) (tensorflow/bts_main.py:136-139).
"""

from __future__ import annotations

import jax.numpy as jnp


def polynomial_decay(
    base_lr: float,
    end_lr: float,
    total_steps: int,
    power: float = 0.9,
):
    """Returns an optax-compatible schedule fn: step -> lr."""

    def schedule(step):
        frac = 1.0 - jnp.minimum(step, total_steps) / total_steps
        return (base_lr - end_lr) * frac**power + end_lr

    return schedule


def polynomial_decay_host(
    base_lr: float,
    end_lr: float,
    total_steps: int,
    power: float = 0.9,
):
    """Pure-Python twin of polynomial_decay for host-side logging.

    Calling the jnp schedule eagerly from the train loop dispatches a tiny
    computation to the device and syncs on it (~30ms/step over the axon
    tunnel) — this version stays on the host.
    """

    def schedule(step: int) -> float:
        frac = 1.0 - min(step, total_steps) / total_steps
        return float((base_lr - end_lr) * frac**power + end_lr)

    return schedule
