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

    # Args-file provenance (pytorch/bts_main.py:565-567). Pin 'auto'
    # normalization to its RESOLVED value: 'auto' sniffs whether
    # --pretrained_model is a TF checkpoint ON DISK, so replaying the
    # argfile on a host without that file would silently flip a
    # caffe-normalized run back to imagenet statistics at eval time.
    with open(os.path.join(run_dir, "arguments.txt"), "w") as f:
        f.write(
            config_to_argfile(
                cfg.replace(
                    normalization=cfg.resolved_normalization,
                    # model_flavor 'auto' sniffs checkpoint files on disk
                    # too — pin it for the same replay-safety reason.
                    model_flavor=cfg.resolved_flavor,
                )
            )
        )
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


def find_run_dir(cfg) -> str | None:
    """Locate the run directory holding a package snapshot for this config.

    Checks (in order): checkpoint_path itself, its parent (checkpoint dirs
    live inside the run dir), and log_directory/model_name.
    """
    candidates = []
    if cfg.checkpoint_path:
        cp = cfg.checkpoint_path.rstrip("/")
        candidates += [cp, os.path.dirname(cp)]
    if cfg.log_directory and cfg.model_name:
        candidates.append(os.path.join(cfg.log_directory, cfg.model_name))
    for c in candidates:
        if c and os.path.isdir(os.path.join(c, "bts_tpu")):
            return c
    return None


def activate_snapshot(run_dir: str) -> bool:
    """Switch subsequent `bts_tpu` imports to the archived package.

    The reference's dynamic-import-of-snapshot pattern
    (pytorch/bts_test.py:68-74, bts_eval.py:72-78, bts_main.py:125-133):
    a checkpoint is always evaluated with the exact code that produced it.
    Returns True if the import root was switched (caller should then
    re-import and re-dispatch); False when there is no snapshot or we are
    already running from this snapshot.
    """
    if not os.path.isdir(os.path.join(run_dir, "bts_tpu")):
        return False
    import importlib

    import bts_tpu

    live_root = os.path.dirname(
        os.path.dirname(os.path.abspath(bts_tpu.__file__))
    )
    if os.path.realpath(live_root) == os.path.realpath(run_dir):
        return False  # already running from this snapshot
    sys.path.insert(0, run_dir)
    for name in [
        m for m in sys.modules if m == "bts_tpu" or m.startswith("bts_tpu.")
    ]:
        del sys.modules[name]
    importlib.invalidate_caches()
    return True
