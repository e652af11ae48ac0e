"""CLI: continuous-eval loop — reference run_bts_eval_schedule.py."""

import sys

from bts_tpu.config import parse_args
from bts_tpu.evaluation.schedule import run_schedule


def main(argv=None) -> int:
    from bts_tpu.utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    cfg = parse_args(argv)
    run_schedule(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
