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


def replicate_tree(tree, mesh: Mesh):
    """Commit every leaf of a pytree to the mesh, fully replicated.

    Must be applied to the fresh train state BEFORE step 0: a jitted step
    keyed on a mesh (in_shardings/out_shardings) produces outputs whose
    avals carry the mesh axis context, while un-placed inputs don't — so
    without this, step 2 retraces AND recompiles the whole program
    (measured: a full second ~60-200s XLA:CPU compile; same double compile
    on the TPU train driver).
    """
    return jax.device_put(tree, replicated(mesh))


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


def _multihost_env_reason(environ) -> str | None:
    """Pure decision logic: does this environment look multi-host?

    Decision table (first match wins; all read from `environ` only, so the
    check never touches — and therefore never initializes — the backend):

    | Signal                                        | Verdict    |
    |-----------------------------------------------|------------|
    | COORDINATOR_ADDRESS / MEGASCALE_COORDINATOR_* | initialize |
    | TPU_WORKER_HOSTNAMES lists >1 host (GKE pod)  | initialize |
    | TPU_PROCESS_ADDRESSES lists >1 process        | initialize |
    | CLOUD_TPU_TASK_ID set (Cloud TPU pod worker)  | initialize |
    | SLURM_JOB_NUM_NODES > 1                       | initialize |
    | OMPI_COMM_WORLD_SIZE > 1                      | initialize |
    | none of the above                             | single     |

    Returns the matching signal name, or None for single-host.
    jax.distributed.initialize() self-configures from each of these
    launcher environments via its cluster auto-detection.
    """
    if environ.get("COORDINATOR_ADDRESS") or environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        return "coordinator_address"
    if len(environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1:
        return "tpu_worker_hostnames"
    if len(environ.get("TPU_PROCESS_ADDRESSES", "").split(",")) > 1:
        return "tpu_process_addresses"
    if environ.get("CLOUD_TPU_TASK_ID"):
        return "cloud_tpu_task_id"
    for k in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(environ.get(k, "1")) > 1:
                return k.lower()
        except ValueError:
            pass
    return None


def maybe_init_distributed(environ=None, initialize_fn=None) -> bool:
    """Initialize multi-host JAX when launched under a cluster environment.

    The reference boots NCCL process groups from --dist_url/--rank
    (pytorch/bts_main.py:328-333); the TPU-native equivalent is
    jax.distributed.initialize(). The decision is made purely from the
    environment (see _multihost_env_reason) BEFORE any backend-touching
    call — querying jax.process_count() first would initialize the local
    backend and make a later initialize() ineffective. No-op when
    single-host or already initialized. Returns True if initialize ran.

    environ / initialize_fn are injectable for unit tests.
    """
    import os

    environ = os.environ if environ is None else environ
    if initialize_fn is None:
        initialize_fn = jax.distributed.initialize
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # older jax
        already = getattr(
            jax._src.distributed.global_state, "client", None
        ) is not None
    if already:
        return False
    reason = _multihost_env_reason(environ)
    if reason is None:
        return False
    try:
        initialize_fn()
        return True
    except Exception as e:  # pragma: no cover - depends on cluster env
        print(
            f"jax.distributed.initialize failed (detected via {reason}): {e}"
        )
        return False
