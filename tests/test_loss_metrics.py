"""silog loss + nine-metric tests against torch/numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.evaluation.metrics import (
    compute_errors,
    compute_errors_masked,
    EVAL_METRICS,
)
from bts_tpu.evaluation.protocol import (
    clamp_prediction,
    eval_mask,
    kb_crop_reembed,
)
from bts_tpu.training.loss import silog_loss
from bts_tpu.training.lr import polynomial_decay


def _silog_numpy(pred, gt, mask, vf):
    d = np.log(pred[mask]) - np.log(gt[mask])
    return np.sqrt((d**2).mean() - vf * d.mean() ** 2) * 10.0


def test_silog_matches_reference_formula(rng):
    pred = rng.uniform(0.5, 10, size=(2, 32, 32)).astype(np.float32)
    gt = rng.uniform(0.5, 10, size=(2, 32, 32)).astype(np.float32)
    mask = gt > 2.0
    want = _silog_numpy(pred, gt, mask, 0.85)
    got = float(silog_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_silog_ignores_masked_entries(rng):
    pred = rng.uniform(0.5, 10, size=(16, 16)).astype(np.float32)
    gt = rng.uniform(0.5, 10, size=(16, 16)).astype(np.float32)
    mask = np.zeros_like(gt, dtype=bool)
    mask[:8] = True
    # Poison the masked-out region — loss must not change.
    pred2 = pred.copy()
    pred2[8:] = 0.0  # log(0) if not masked
    l1 = float(silog_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    l2 = float(silog_loss(jnp.asarray(pred2), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    assert np.isfinite(l2)


def test_silog_grad_finite_under_mask(rng):
    pred = rng.uniform(0.5, 10, size=(8, 8)).astype(np.float32)
    gt = rng.uniform(0.5, 10, size=(8, 8)).astype(np.float32)
    mask = gt > 5.0
    g = jax.grad(
        lambda p: silog_loss(p, jnp.asarray(gt), jnp.asarray(mask))
    )(jnp.asarray(pred))
    assert np.all(np.isfinite(np.asarray(g)))
    # Gradient w.r.t. masked-out pixels must be exactly zero.
    assert np.all(np.asarray(g)[~mask] == 0.0)


def test_compute_errors_golden():
    """Hand-computed golden values on a tiny vector."""
    gt = np.array([1.0, 2.0, 4.0])
    pred = np.array([1.0, 2.0, 4.0])
    m = compute_errors(gt, pred)
    # Perfect prediction: all error metrics 0, all deltas 1.
    np.testing.assert_allclose(m[:6], 0.0, atol=1e-12)
    np.testing.assert_allclose(m[6:], 1.0)

    pred2 = np.array([1.3, 2.0, 4.0])
    m2 = compute_errors(gt, pred2)
    assert m2[EVAL_METRICS.index("d1")] == pytest.approx(2.0 / 3.0)
    assert m2[EVAL_METRICS.index("abs_rel")] == pytest.approx(0.3 / 3.0)
    assert m2[EVAL_METRICS.index("rms")] == pytest.approx(
        np.sqrt(0.09 / 3.0)
    )


def test_compute_errors_masked_matches_numpy(rng):
    gt = rng.uniform(0.1, 10, size=(3, 24, 24)).astype(np.float32)
    pred = rng.uniform(0.1, 10, size=(3, 24, 24)).astype(np.float32)
    mask = gt > 1.0
    got, valid = compute_errors_masked(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask)
    )
    assert got.shape == (3, 9)
    np.testing.assert_allclose(np.asarray(valid), 1.0)
    for i in range(3):
        want = compute_errors(gt[i][mask[i]], pred[i][mask[i]])
        np.testing.assert_allclose(np.asarray(got[i]), want, rtol=2e-4)


def test_compute_errors_masked_empty_mask(rng):
    gt = rng.uniform(0.1, 10, size=(1, 8, 8)).astype(np.float32)
    pred = rng.uniform(0.1, 10, size=(1, 8, 8)).astype(np.float32)
    mask = np.zeros_like(gt, dtype=bool)
    got, valid = compute_errors_masked(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask)
    )
    assert float(valid[0]) == 0.0
    np.testing.assert_allclose(np.asarray(got), 0.0)
    assert np.all(np.isfinite(np.asarray(got)))


def test_clamp_prediction():
    pred = np.array([[np.inf, np.nan, 0.0001, 100.0, 5.0]], dtype=np.float32)
    out = clamp_prediction(pred, 1e-3, 80.0)
    np.testing.assert_allclose(out, [[80.0, 1e-3, 1e-3, 80.0, 5.0]])


def test_eval_mask_nyu_eigen_crop():
    gt = np.ones((480, 640), dtype=np.float32) * 5.0
    mask = eval_mask(gt, 1e-3, 10.0, dataset="nyu", eigen_crop=True)
    # Fixed region [45:471, 41:601] (pytorch/bts_main.py:293).
    assert mask[45, 41] and mask[470, 600]
    assert not mask[44, 41] and not mask[45, 40]
    assert not mask[471, 41] and not mask[45, 601]
    assert mask.sum() == (471 - 45) * (601 - 41)


def test_eval_mask_garg_crop():
    gt = np.ones((352, 1216), dtype=np.float32) * 5.0
    mask = eval_mask(gt, 1e-3, 80.0, dataset="kitti", garg_crop=True)
    r0, r1 = int(0.40810811 * 352), int(0.99189189 * 352)
    c0, c1 = int(0.03594771 * 1216), int(0.96405229 * 1216)
    assert mask.sum() == (r1 - r0) * (c1 - c0)


def test_kb_crop_reembed():
    pred = np.ones((352, 1216), dtype=np.float32)
    out = kb_crop_reembed(pred, 375, 1242)
    assert out.shape == (375, 1242)
    top, left = 375 - 352, (1242 - 1216) // 2
    assert out[top, left] == 1.0 and out[top - 1, left] == 0.0
    assert out.sum() == 352 * 1216


def test_polynomial_decay():
    sched = polynomial_decay(1e-4, 1e-5, 100, power=0.9)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1e-5, rtol=1e-6)
    # Matches the reference manual formula (pytorch/bts_main.py:457).
    step = 37
    want = (1e-4 - 1e-5) * (1 - step / 100) ** 0.9 + 1e-5
    np.testing.assert_allclose(float(sched(step)), want, rtol=1e-5)
    # Clamps past the end instead of going NaN.
    assert np.isfinite(float(sched(150)))
