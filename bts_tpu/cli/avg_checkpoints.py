"""CLI: average N checkpoints into a params-only inference checkpoint.

SWA-style eval helper with no reference equivalent (the reference retains
per-metric best checkpoints, pytorch/bts_main.py:513-539, but never
combines them). Typical use: average the last K periodic 'model-{step}'
snapshots (or several best-metric ones) and point cli.test / cli.eval at
the result.

    python -m bts_tpu.cli.avg_checkpoints --out avg_ckpt run/model-4000 \
        run/model-4500 run/model-5000
"""

from __future__ import annotations

import argparse
import sys

from bts_tpu.training.checkpoint import average_checkpoints, save_params_only


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Average checkpoints into a params-only checkpoint"
    )
    parser.add_argument(
        "--out", required=True, help="output checkpoint directory"
    )
    parser.add_argument(
        "checkpoints", nargs="+", help="input checkpoint directories"
    )
    args = parser.parse_args(argv)
    params, stats = average_checkpoints(args.checkpoints)
    save_params_only(args.out, params, stats)
    print(
        f"Averaged {len(args.checkpoints)} checkpoints -> {args.out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
