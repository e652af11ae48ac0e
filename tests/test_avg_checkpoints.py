"""Checkpoint averaging (SWA-style eval helper)."""

import jax
import numpy as np

from bts_tpu.training import checkpoint as ckpt_lib


def _save(tmp_path, name, value):
    params = {
        "encoder": {"w": np.full((3, 2), value, np.float32)},
        "decoder": {"b": np.full((4,), value * 2, np.float32)},
    }
    stats = {"bn": {"mean": np.full((2,), value, np.float32)}}
    path = str(tmp_path / name)
    ckpt_lib.save_params_only(path, params, stats)
    return path


def test_average_checkpoints_uniform_mean(tmp_path):
    paths = [
        _save(tmp_path, "model-1", 1.0),
        _save(tmp_path, "model-2", 2.0),
        _save(tmp_path, "model-3", 6.0),
    ]
    params, stats = ckpt_lib.average_checkpoints(paths)
    np.testing.assert_allclose(params["encoder"]["w"], 3.0)
    np.testing.assert_allclose(params["decoder"]["b"], 6.0)
    np.testing.assert_allclose(stats["bn"]["mean"], 3.0)
    assert params["encoder"]["w"].dtype == np.float32
    # Tree structure preserved.
    assert jax.tree.structure(params) is not None


def test_avg_checkpoints_cli_roundtrip(tmp_path):
    from bts_tpu.cli.avg_checkpoints import main

    paths = [
        _save(tmp_path, "model-1", 0.0),
        _save(tmp_path, "model-2", 4.0),
    ]
    out = str(tmp_path / "avg")
    assert main(["--out", out] + paths) == 0
    params, stats = ckpt_lib.load_params_only(out)
    np.testing.assert_allclose(params["encoder"]["w"], 2.0)
    np.testing.assert_allclose(stats["bn"]["mean"], 2.0)


def test_average_checkpoints_averages_bfloat16(tmp_path):
    """Extension floats (ml_dtypes.bfloat16) must be averaged, not silently
    kept from the first checkpoint (np.issubdtype misses them)."""
    import jax.numpy as jnp

    for name, value in (("model-a", 1.0), ("model-b", 3.0)):
        params = {"w": np.asarray(np.full((2,), value), jnp.bfloat16)}
        stats = {}
        ckpt_lib.save_params_only(str(tmp_path / name), params, stats)
    params, _ = ckpt_lib.average_checkpoints(
        [str(tmp_path / "model-a"), str(tmp_path / "model-b")]
    )
    assert params["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(params["w"].astype(np.float32), 2.0)


def test_average_checkpoints_keeps_non_float_leaves(tmp_path):
    """Non-float leaves keep the FIRST checkpoint's value (no truncated
    integer means)."""
    for name, step in (("model-a", 4500), ("model-b", 5000)):
        params = {"w": np.full((2,), float(step), np.float32)}
        stats = {"counter": np.asarray(step, np.int64)}
        ckpt_lib.save_params_only(str(tmp_path / name), params, stats)
    params, stats = ckpt_lib.average_checkpoints(
        [str(tmp_path / "model-a"), str(tmp_path / "model-b")]
    )
    np.testing.assert_allclose(params["w"], 4750.0)
    assert stats["counter"] == 4500  # first checkpoint's, not the mean
    assert stats["counter"].dtype == np.int64
