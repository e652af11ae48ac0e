"""CLI: live 3D demo — reference {pytorch,tensorflow}/bts_live_3d.py.

Two modes:
  * --image_dir DIR [--out_dir DIR]: headless — render point-cloud views
    of every frame in DIR to PNGs (no GUI stack needed).
  * no --image_dir: interactive webcam viewer (requires cv2/Qt/OpenGL).
"""

import sys

from bts_tpu.apps.live3d import main as live3d_main
from bts_tpu.apps.live3d import run_headless
from bts_tpu.config import parse_args


def main(argv=None) -> int:
    from bts_tpu.utils.jax_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)

    def take(flag):
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return None

    image_dir = take("--image_dir")
    out_dir = take("--out_dir") or ""
    cfg = parse_args(argv)
    if image_dir:
        n = run_headless(cfg, image_dir, out_dir)
        print(f"Rendered {n} frames")
        return 0
    return live3d_main(cfg)


if __name__ == "__main__":
    sys.exit(main())
