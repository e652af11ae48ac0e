"""CLI: prediction dump — `python -m bts_tpu.cli.test arguments_test_nyu.txt`.

Reference entry: pytorch/bts_test.py.
"""

import sys

from bts_tpu.apps.predict import run_predictions
from bts_tpu.config import parse_args


def main(argv=None) -> int:
    cfg = parse_args(argv)
    run_predictions(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
