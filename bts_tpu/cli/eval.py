"""CLI: offline checkpoint-watcher eval — reference pytorch/bts_eval.py."""

import sys

from bts_tpu.config import parse_args
from bts_tpu.evaluation.offline import evaluate_pending


def main(argv=None) -> int:
    cfg = parse_args(argv)
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
