"""BTS-TPU: a TPU-native monocular depth estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of cleinc/bts
("From Big to Small: Multi-Scale Local Planar Guidance for Monocular Depth
Estimation", arXiv 1907.10326). Single pure-functional codebase: encoder zoo,
Dense-ASPP + multi-scale Local Planar Guidance decoder, silog training with
GSPMD data parallelism over a `jax.sharding.Mesh`, and the reference's full
eval/test/app surface.

Reference parity map lives in SURVEY.md; each module's docstring cites the
reference files (path:line under /root/reference) whose behavior it covers.
"""

__version__ = "0.1.0"

from bts_tpu.config import Config, parse_args  # noqa: F401
