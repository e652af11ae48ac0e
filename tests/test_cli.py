"""CLI entry smoke tests + checkpoint retention."""

import os

import numpy as np
import pytest


def test_cli_train_rejects_non_train_mode(capsys):
    from bts_tpu.cli.train import main

    assert main(["--mode", "test"]) == -1


def test_cli_sequence_requires_image_dir():
    from bts_tpu.cli.sequence import main

    assert main(["--dataset", "nyu"]) == 1


def test_cli_eval_with_pngs_empty_dir(tmp_path, capsys):
    from bts_tpu.cli.eval_with_pngs import main

    rc = main(
        [
            "--pred_path", str(tmp_path),
            "--gt_path", str(tmp_path),
            "--dataset", "nyu",
        ]
    )
    assert rc == 0
    assert "0 eval samples" in capsys.readouterr().out


def test_prune_step_checkpoints(tmp_path):
    from bts_tpu.training.checkpoint import (
        list_step_checkpoints,
        prune_step_checkpoints,
    )

    for step in (100, 200, 300, 400):
        os.makedirs(tmp_path / f"model-{step}")
    os.makedirs(tmp_path / "model-100-best_d1_0.88000")
    prune_step_checkpoints(str(tmp_path), max_to_keep=2)
    assert sorted(list_step_checkpoints(str(tmp_path))) == [300, 400]
    # Best checkpoints survive pruning.
    assert (tmp_path / "model-100-best_d1_0.88000").exists()
    # max_to_keep=0 disables pruning.
    prune_step_checkpoints(str(tmp_path), max_to_keep=0)
    assert sorted(list_step_checkpoints(str(tmp_path))) == [300, 400]
