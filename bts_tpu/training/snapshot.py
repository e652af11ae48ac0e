"""Run-provenance snapshot.

Reference mechanism (SURVEY.md §1): at train start the model/loader/driver
sources and the args file are copied into log_directory/model_name/ so every
checkpoint can be evaluated with the exact code that produced it
(pytorch/bts_main.py:560-586, tensorflow/bts_main.py:292-319). The TPU-native
equivalent snapshots the whole `bts_tpu` package plus the resolved config.
"""

from __future__ import annotations

import os
import shutil
import sys

from bts_tpu.config import Config, config_to_argfile


def snapshot_run(cfg: Config, argv=None) -> str:
    """Copy package sources + config into log_directory/model_name.

    Returns the run directory. Downstream consumers (eval/test/live) can
    prepend the snapshot dir to sys.path to import the archived package —
    the reference's dynamic-import-of-snapshot pattern
    (pytorch/bts_test.py:68-74).
    """
    run_dir = os.path.join(cfg.log_directory or ".", cfg.model_name)
    os.makedirs(run_dir, exist_ok=True)

    # Args-file provenance (pytorch/bts_main.py:565-567).
    with open(os.path.join(run_dir, "arguments.txt"), "w") as f:
        f.write(config_to_argfile(cfg))
    if argv:
        with open(os.path.join(run_dir, "argv.txt"), "w") as f:
            f.write(" ".join(argv) + "\n")

    # Package snapshot (the reference copies bts.py/bts_main.py/
    # bts_dataloader.py; we archive the whole package).
    pkg_dir = os.path.dirname(os.path.abspath(__file__ + "/.."))
    dst = os.path.join(run_dir, "bts_tpu")
    if os.path.abspath(pkg_dir) != os.path.abspath(dst):
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(
            pkg_dir,
            dst,
            ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.so"),
        )
    return run_dir


def use_snapshot(run_dir: str) -> None:
    """Prefer the archived package for subsequent imports."""
    if os.path.isdir(os.path.join(run_dir, "bts_tpu")):
        sys.path.insert(0, run_dir)
