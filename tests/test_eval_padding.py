"""Eval forward must handle resolutions not divisible by the stride (32)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow  # multi-minute: full-model builds / oracles / e2e

from bts_tpu.evaluation.online import make_eval_forward
from bts_tpu.models.bts import BTSModel, init_model


def test_eval_forward_pads_odd_resolutions(rng):
    model = BTSModel(encoder_name="mobilenetv2_bts", max_depth=10.0)
    params, stats = init_model(model, jax.random.key(0), (1, 64, 96, 3))
    variables = {"params": params, "batch_stats": stats}
    forward = make_eval_forward(model)
    # 70x100 is not a multiple of 32.
    img = rng.normal(size=(2, 70, 100, 3)).astype(np.float32)
    out = forward(variables, img, np.full((2,), 518.8579, np.float32))
    assert np.asarray(out).shape == (2, 70, 100)
    assert np.all(np.isfinite(np.asarray(out)))
