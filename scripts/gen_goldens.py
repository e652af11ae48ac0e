"""Regenerate the committed golden values in tests/test_golden_e2e.py.

Run on the XLA:CPU backend (the suite's backend) and paste the printed
block between the GOLDEN VALUES markers. Only do this after an
*intentional* numerics change, with the parity suite green.

Usage: python scripts/gen_goldens.py
"""

import pathlib
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))
import numpy as np  # noqa: E402

import test_golden_e2e as g  # noqa: E402


def main() -> None:
    summary = g.forward_summary(g.flagship_forward())
    with tempfile.TemporaryDirectory() as td:
        root = pathlib.Path(td) / "data"
        manifest = g.write_synthetic_nyu(root)
        measures = np.asarray(g.eval_metrics_seeded(root, manifest))

    print("GOLDEN_FORWARD = {")
    for k, v in summary.items():
        print(f'    "{k}": {v!r},')
    print("}")
    print(
        "GOLDEN_METRICS = np.array(\n    "
        + repr(measures.tolist())
        + "\n)"
    )


if __name__ == "__main__":
    main()
