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
