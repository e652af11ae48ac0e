"""CLI: prediction dump — `python -m bts_tpu.cli.test arguments_test_nyu.txt`.

Reference entry: pytorch/bts_test.py.
"""

import sys

from bts_tpu.apps.predict import run_predictions
from bts_tpu.config import parse_args


def main(argv=None) -> int:
    from bts_tpu.utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = parse_args(argv)

    # Evaluate with the archived code that produced the checkpoint
    # (reference dynamic-import pattern, pytorch/bts_test.py:68-74).
    from bts_tpu.training.snapshot import activate_snapshot, find_run_dir

    run_dir = find_run_dir(cfg)
    if run_dir and activate_snapshot(run_dir):
        import importlib

        print(f"Using model snapshot from {run_dir}")
        return importlib.import_module("bts_tpu.cli.test").main(argv)

    run_predictions(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
