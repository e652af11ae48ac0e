"""CLI: offline checkpoint-watcher eval — reference pytorch/bts_eval.py."""

import sys

from bts_tpu.config import parse_args
from bts_tpu.evaluation.offline import evaluate_pending


def main(argv=None) -> int:
    from bts_tpu.utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = parse_args(argv)

    # Evaluate checkpoints with the archived code that produced them
    # (reference dynamic-import pattern, pytorch/bts_eval.py:72-78).
    from bts_tpu.training.snapshot import activate_snapshot, find_run_dir

    run_dir = find_run_dir(cfg)
    if run_dir and activate_snapshot(run_dir):
        import importlib

        print(f"Using model snapshot from {run_dir}")
        return importlib.import_module("bts_tpu.cli.eval").main(argv)

    writer = None
    try:
        from tensorboardX import SummaryWriter
        import os

        summary_dir = (
            os.path.join(cfg.eval_summary_directory, cfg.model_name)
            if cfg.eval_summary_directory
            else os.path.join(cfg.log_directory or ".", "eval")
        )
        writer = SummaryWriter(summary_dir, flush_secs=30)
    except Exception:
        pass
    evaluate_pending(cfg, writer=writer)
    return 0


if __name__ == "__main__":
    sys.exit(main())
