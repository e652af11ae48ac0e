"""CLI: directory inference — reference tensorflow/bts_sequence.py.

Usage: python -m bts_tpu.cli.sequence --image_dir DIR [flags | @argfile]
"""

import sys

from bts_tpu.apps.sequence import run_sequence
from bts_tpu.config import parse_args


def main(argv=None) -> int:
    from bts_tpu.utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    image_dir = None
    if "--image_dir" in argv:
        i = argv.index("--image_dir")
        image_dir = argv[i + 1]
        del argv[i : i + 2]
    cfg = parse_args(argv)
    if not image_dir:
        print("--image_dir is required")
        return 1
    n = run_sequence(cfg, image_dir)
    print(f"Processed {n} images")
    return 0


if __name__ == "__main__":
    sys.exit(main())
