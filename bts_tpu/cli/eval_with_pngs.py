"""CLI: PNG-vs-PNG evaluation — reference utils/eval_with_pngs.py."""

import sys

from bts_tpu.config import parse_args
from bts_tpu.evaluation.png_eval import eval_pngs


def main(argv=None) -> int:
    from bts_tpu.utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    cfg = parse_args(argv)
    eval_pngs(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
