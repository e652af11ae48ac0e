"""CLI: live 3D demo — reference {pytorch,tensorflow}/bts_live_3d.py."""

import sys

from bts_tpu.apps.live3d import main as live3d_main
from bts_tpu.config import parse_args


def main(argv=None) -> int:
    return live3d_main(parse_args(argv))


if __name__ == "__main__":
    sys.exit(main())
