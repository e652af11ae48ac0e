"""Device mesh + sharding utilities.

TPU-native replacement for the reference's distributed backends
(SURVEY.md §5.8): instead of mp.spawn + NCCL process groups
(pytorch/bts_main.py:328-333) or in-graph towers
(tensorflow/bts_main.py:163-203), we build a `jax.sharding.Mesh` over the
data axis and let GSPMD insert the gradient all-reduce over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int = 0, axis_name: str = "data", devices=None
) -> Mesh:
    """1-D data-parallel mesh over local (or provided) devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(
    batch: dict,
    mesh: Mesh,
    axis_name: str = "data",
    num_processes: int | None = None,
) -> dict:
    """Place a host batch with the leading dim sharded over the mesh.

    Single-host: a plain sharded device_put. Multi-host: each process holds
    its local slice of the global batch; assemble the global array from
    process-local data (the SPMD analogue of DistributedSampler feeding each
    DDP rank its shard).

    num_processes is injectable so the multi-host assembly path can be
    exercised in single-process tests (it degenerates to the same placement
    when all shards are locally addressable).
    """
    sharding = batch_sharding(mesh, axis_name)
    if num_processes is None:
        num_processes = jax.process_count()
    if num_processes > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def process_shard_info() -> tuple[int, int]:
    """(num_processes, process_index) for per-host manifest sharding."""
    return jax.process_count(), jax.process_index()


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX when launched under a cluster environment.

    The reference boots NCCL process groups from --dist_url/--rank
    (pytorch/bts_main.py:328-333); the TPU-native equivalent is
    jax.distributed.initialize(), which self-configures from the TPU pod /
    cluster environment. No-op when single-host or already initialized.
    """
    import os

    if jax.process_count() > 1:
        return  # already initialized
    if any(
        k in os.environ
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ):
        try:
            jax.distributed.initialize()
        except Exception as e:  # pragma: no cover
            print(f"jax.distributed.initialize failed: {e}")
