"""Data-parallel batched inference over a device mesh.

The serving-side twin of the training mesh (SURVEY.md §5.8): variables
replicated, batch sharded on the data axis, output left sharded on
device. On a v5e-8 this is how the single-chip ~400 img/s flagship
number scales across chips — pure data parallelism, no collectives in
the forward graph, so throughput is chips x single-chip rate minus only
input-feed overheads.

Usage:
    mesh = make_mesh()                      # all local devices
    variables = replicate_tree(variables, mesh)
    fwd = make_sharded_forward(model, mesh)
    batch = shard_batch({"image": ..., "focal": ...}, mesh)
    depth = fwd(variables, batch["image"], batch["focal"])  # sharded (B,H,W)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_forward(model, mesh: Mesh, axis_name: str = "data"):
    """Jitted (variables, image (B,H,W,3), focal (B,)) -> depth (B,H,W).

    The batch dim is sharded over the mesh; B must be divisible by the
    mesh size. Pass variables through `mesh.replicate_tree` first so
    repeated calls reuse one executable (the mesh-context retrace trap,
    docs/DESIGN.md round 4).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def forward(variables, image, focal):
        return model.apply(variables, image, focal, train=False)[4][..., 0]

    return jax.jit(
        forward,
        in_shardings=(repl, data, data),
        out_shardings=data,
    )
