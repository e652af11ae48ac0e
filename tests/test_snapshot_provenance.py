"""Snapshot provenance: checkpoints are evaluated with the archived code.

Reference mechanism: every downstream consumer dynamically imports the run
dir's code snapshot (pytorch/bts_test.py:68-74, bts_eval.py:72-78,
bts_main.py:125-133). These tests prove the TPU build's equivalent —
find_run_dir + activate_snapshot + CLI re-dispatch — actually switches the
import root, by planting a marker in the archived copy and asserting the
live CLI executes it even though the live package differs.
"""

import os
import sys

from bts_tpu.config import Config
from bts_tpu.training.snapshot import (
    activate_snapshot,
    find_run_dir,
    snapshot_run,
)


def _purge_and_restore(saved_modules, run_dir):
    """Undo activate_snapshot: restore original module identities."""
    if run_dir in sys.path:
        sys.path.remove(run_dir)
    for name in [
        m for m in sys.modules if m == "bts_tpu" or m.startswith("bts_tpu.")
    ]:
        del sys.modules[name]
    sys.modules.update(saved_modules)


def _snapshot_module_backup():
    return {
        m: mod
        for m, mod in sys.modules.items()
        if m == "bts_tpu" or m.startswith("bts_tpu.")
    }


def test_find_run_dir(tmp_path):
    run_dir = str(tmp_path / "logs" / "mymodel")
    os.makedirs(os.path.join(run_dir, "bts_tpu"))

    # checkpoint_path == the run dir itself
    cfg = Config(checkpoint_path=run_dir)
    assert find_run_dir(cfg) == run_dir
    # checkpoint_path = a checkpoint dir inside the run dir
    cfg = Config(checkpoint_path=os.path.join(run_dir, "model-500"))
    assert find_run_dir(cfg) == run_dir
    # log_directory + model_name
    cfg = Config(log_directory=str(tmp_path / "logs"), model_name="mymodel")
    assert find_run_dir(cfg) == run_dir
    # nothing there
    assert find_run_dir(Config(checkpoint_path=str(tmp_path / "x"))) is None


def test_activate_snapshot_switches_import_root(tmp_path):
    cfg = Config(log_directory=str(tmp_path), model_name="prov_test")
    run_dir = snapshot_run(cfg)

    # The live package changes after the snapshot...
    marker = os.path.join(run_dir, "bts_tpu", "__init__.py")
    with open(marker, "a") as f:
        f.write("\nSNAPSHOT_MARKER = 'archived'\n")

    saved = _snapshot_module_backup()
    try:
        assert activate_snapshot(run_dir)
        import bts_tpu  # noqa: F811

        # ...but imports now resolve to the archived copy.
        assert os.path.realpath(bts_tpu.__file__).startswith(
            os.path.realpath(run_dir)
        )
        assert bts_tpu.SNAPSHOT_MARKER == "archived"
        # Re-activating from inside the snapshot is a no-op (no recursion).
        assert not activate_snapshot(run_dir)
    finally:
        _purge_and_restore(saved, run_dir)

    import bts_tpu

    assert not os.path.realpath(bts_tpu.__file__).startswith(
        os.path.realpath(run_dir)
    )


def test_cli_redispatches_into_snapshot(tmp_path):
    """End-to-end: cli.test with a checkpoint inside a run dir executes the
    ARCHIVED cli, not the live one (proven via a planted sentinel main)."""
    cfg = Config(log_directory=str(tmp_path), model_name="prov_cli")
    run_dir = snapshot_run(cfg)
    sentinel = str(tmp_path / "ran_from_snapshot")

    # Simulate the live package having moved on since the run: the archived
    # cli.test is (now-different) code whose execution we can detect.
    with open(os.path.join(run_dir, "bts_tpu", "cli", "test.py"), "w") as f:
        f.write(
            "def main(argv=None):\n"
            f"    open({sentinel!r}, 'w').write('yes')\n"
            "    return 0\n"
        )

    ckpt = os.path.join(run_dir, "model-42")
    os.makedirs(ckpt, exist_ok=True)

    from bts_tpu.cli import test as cli_test

    saved = _snapshot_module_backup()
    try:
        rc = cli_test.main(["--checkpoint_path", ckpt])
        assert rc == 0
        assert os.path.exists(sentinel)
    finally:
        _purge_and_restore(saved, run_dir)


def test_snapshot_pins_resolved_normalization(tmp_path):
    """'auto' normalization resolves against --pretrained_model's existence
    ON DISK; the snapshot argfile must record the resolved style so eval on
    a host without the original checkpoint keeps the training statistics."""
    tf_ckpt = tmp_path / "imagenet_model"
    (tmp_path / "imagenet_model.index").write_bytes(b"\x00")
    cfg = Config(
        log_directory=str(tmp_path),
        model_name="prov_norm",
        pretrained_model=str(tf_ckpt),
    )
    assert cfg.resolved_normalization == "caffe"
    run_dir = snapshot_run(cfg)
    args_text = open(os.path.join(run_dir, "arguments.txt")).read()
    assert "--normalization caffe" in args_text

    # Replaying the argfile elsewhere (checkpoint file gone) keeps caffe.
    os.remove(tmp_path / "imagenet_model.index")
    from bts_tpu.config import parse_args

    replayed = parse_args([os.path.join(run_dir, "arguments.txt")])
    assert replayed.resolved_normalization == "caffe"
