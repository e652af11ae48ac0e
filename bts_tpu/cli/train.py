"""CLI: training — `python -m bts_tpu.cli.train arguments_train_nyu.txt`.

Reference entry: pytorch/bts_main.py (same args-file convention).
"""

import sys

from bts_tpu.config import parse_args


def main(argv=None) -> int:
    from bts_tpu.utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = parse_args(argv)
    if cfg.mode != "train":
        print("cli.train is only for training. Use cli.test instead.")
        return -1

    # Resuming from a checkpoint inside a run dir continues with the
    # archived code that produced it (reference conditional dynamic import,
    # pytorch/bts_main.py:125-133).
    if cfg.checkpoint_path:
        from bts_tpu.training.snapshot import (
            activate_snapshot,
            find_run_dir,
        )

        run_dir = find_run_dir(cfg)
        if run_dir and activate_snapshot(run_dir):
            import importlib

            print(f"Using model snapshot from {run_dir}")
            return importlib.import_module("bts_tpu.cli.train").main(argv)

    from bts_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    from bts_tpu.training.loop import train

    return 0 if train(cfg) >= 0 else -1


if __name__ == "__main__":
    sys.exit(main())
