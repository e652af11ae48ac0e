"""CLI: training — `python -m bts_tpu.cli.train arguments_train_nyu.txt`.

Reference entry: pytorch/bts_main.py (same args-file convention).
"""

import sys

from bts_tpu.config import parse_args


def main(argv=None) -> int:
    cfg = parse_args(argv)
    if cfg.mode != "train":
        print("cli.train is only for training. Use cli.test instead.")
        return -1
    from bts_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    from bts_tpu.training.loop import train

    return 0 if train(cfg) >= 0 else -1


if __name__ == "__main__":
    sys.exit(main())
