"""Single-process simulation of the multi-process (multi-host) branches.

The reference exercises its distributed paths only on real hardware
(mp.spawn + NCCL, pytorch/bts_main.py:556-604; eval all_reduce :302-304).
Here the process count and the collective are injectable, so the
`process_count() > 1` code executes inside the suite and its
shard-composition math is asserted against the single-process result.
"""

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.medium  # round-end canary tier (see pyproject markers)

import jax

from bts_tpu.config import Config
from bts_tpu.data.loader import EvalLoader
from bts_tpu.evaluation.online import make_eval_forward, run_online_eval
from bts_tpu.models.bts import create_model, init_model
from bts_tpu.parallel.mesh import make_mesh, shard_batch

H, W = 64, 96


def test_shard_batch_multihost_assembly_matches_device_put():
    # num_processes>1 routes through make_array_from_process_local_data;
    # with every shard locally addressable it must produce the same global
    # array + sharding as the single-host device_put path.
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(8, H, W, 3)).astype(np.float32),
        "focal": np.full((8,), 518.8579, np.float32),
    }
    single = shard_batch(batch, mesh)
    multi = shard_batch(batch, mesh, num_processes=2)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(single[k]), np.asarray(multi[k]))
        assert multi[k].sharding.is_equivalent_to(single[k].sharding, multi[k].ndim)


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_eval") / "data"
    scene = root / "office_0001"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(7)
    lines = []
    for i in range(5):
        rgb = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        depth = rng.integers(500, 9000, size=(H, W), dtype=np.uint16)
        Image.fromarray(rgb).save(scene / f"rgb_{i:05d}.jpg")
        Image.fromarray(depth).save(scene / f"sync_depth_{i:05d}.png")
        lines.append(
            f"office_0001/rgb_{i:05d}.jpg office_0001/sync_depth_{i:05d}.png 518.8579"
        )
    manifest = root / "files.txt"
    manifest.write_text("\n".join(lines) + "\n")
    cfg = Config(
        encoder="mobilenetv2_bts",
        dataset="nyu",
        max_depth=10.0,
        data_path_eval=str(root),
        gt_path_eval=str(root),
        filenames_file_eval=str(manifest),
        min_depth_eval=1e-3,
        max_depth_eval=10.0,
        eval_batch_size=2,
        input_height=H,
        input_width=W,
    )
    model = create_model(cfg)
    params, stats = init_model(model, jax.random.key(0), (1, H, W, 3))
    return cfg, model, {"params": params, "batch_stats": stats}


def test_online_eval_simulated_3process_equals_single(eval_setup):
    cfg, model, variables = eval_setup
    forward = make_eval_forward(model)  # shared jit cache across "ranks"

    single = run_online_eval(model, variables, cfg, forward=forward, verbose=False)
    assert single is not None

    # Phase 1: run each simulated rank on its [r::3] shard; capture the
    # local metric vector its allgather would contribute.
    local_vecs = []

    def capture(vec):
        local_vecs.append(np.array(vec, copy=True))
        return np.stack([vec])

    for r in range(3):
        loader = EvalLoader(cfg, "online_eval", num_shards=3, shard_index=r)
        out = run_online_eval(
            model,
            variables,
            cfg,
            loader,
            forward,
            verbose=False,
            process_info=(3, r),
            allgather_fn=capture,
        )
        if r != 0:
            assert out is None  # non-primary ranks return None

    assert len(local_vecs) == 3
    # Exact-count sharding: the 5 samples are partitioned, none duplicated.
    assert sum(int(round(float(v[9]))) for v in local_vecs) == 5

    # Phase 2: replay rank 0 with the full gathered stack — the production
    # reduction path computes the combined measures.
    loader0 = EvalLoader(cfg, "online_eval", num_shards=3, shard_index=0)
    combined = run_online_eval(
        model,
        variables,
        cfg,
        loader0,
        forward,
        verbose=False,
        process_info=(3, 0),
        allgather_fn=lambda vec: np.stack(
            [vec] + [v for v in local_vecs[1:]]
        ),
    )
    # float32 collective payload (matches device collectives) -> small tol.
    np.testing.assert_allclose(combined, single, rtol=2e-5)


def test_sharded_inference_matches_single_device(eval_setup):
    """Data-parallel inference over the 8-device mesh: same numbers as the
    single-device forward, output sharded, one executable across calls."""
    from bts_tpu.parallel.inference import make_sharded_forward
    from bts_tpu.parallel.mesh import replicate_tree

    cfg, model, variables = eval_setup
    mesh = make_mesh(8)
    repl_vars = replicate_tree(variables, mesh)
    fwd = make_sharded_forward(model, mesh)

    rng = np.random.default_rng(3)
    image = rng.normal(size=(8, H, W, 3)).astype(np.float32)
    focal = np.full((8,), 518.8579, np.float32)
    batch = shard_batch({"image": image, "focal": focal}, mesh)

    out = fwd(repl_vars, batch["image"], batch["focal"])
    assert out.shape == (8, H, W)
    # Output stays sharded on the data axis (no implicit gather).
    assert out.sharding.is_equivalent_to(
        jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data")), out.ndim
    )

    single = model.apply(variables, image, focal, train=False)[4][..., 0]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(single), rtol=2e-5, atol=1e-5
    )

    # Executable reuse across calls (variables were mesh-placed).
    fwd(repl_vars, batch["image"], batch["focal"])
    assert fwd._cache_size() == 1


def test_train_step_executable_reuse():
    """The mesh-context retrace trap (docs/DESIGN.md round 4): a state not
    committed to the mesh before step 0 makes step 2 retrace + recompile
    the whole train step. create_train_state(mesh=...) must keep the jit
    cache at ONE entry across steps; the unplaced path is pinned at two as
    the negative control. Uses a one-conv stand-in model so both compiles
    are fast — the trap lives in the step/state plumbing, not the model."""
    import flax.linen as nn
    import jax.numpy as jnp

    from bts_tpu.training.optim import create_optimizer
    from bts_tpu.training.state import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    class _Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, focal, train=False):
            d = 10.0 * jax.nn.sigmoid(nn.Conv(1, (3, 3))(x))
            return (d, d, d, d, d)

    cfg = Config(dataset="nyu", max_depth=10.0, batch_size=8)
    model = _Tiny()
    rng = np.random.default_rng(0)
    batch_np = {
        "image": rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
        "depth": rng.uniform(0.5, 9.5, size=(8, 16, 16, 1)).astype(np.float32),
        "focal": np.full((8,), 518.8579, np.float32),
    }
    mesh = make_mesh(8)
    device_batch = shard_batch(batch_np, mesh)

    def run(place_on_mesh: bool) -> int:
        variables = model.init(
            jax.random.key(0), jnp.zeros((8, 16, 16, 3)), jnp.zeros((8,))
        )
        params = variables["params"]
        tx, _ = create_optimizer(cfg, params, num_total_steps=100)
        state = create_train_state(
            params, {}, tx, mesh=mesh if place_on_mesh else None
        )
        step_fn = jit_train_step(make_train_step(model, tx, cfg), mesh)
        for _ in range(3):
            state, _ = step_fn(state, device_batch)
        return step_fn._cache_size()

    assert run(place_on_mesh=True) == 1
    # Negative control: the unplaced state really does cost a second
    # trace/compile (if jax ever stops keying on the mesh context, this
    # documents that the placement became optional).
    assert run(place_on_mesh=False) == 2


def test_multihost_env_decision_table():
    """maybe_init_distributed decides purely from the environment
    (VERDICT r2 #7): no backend call before initialize, documented table."""
    from bts_tpu.parallel.mesh import (
        _multihost_env_reason,
        maybe_init_distributed,
    )

    assert _multihost_env_reason({}) is None
    assert (
        _multihost_env_reason({"COORDINATOR_ADDRESS": "h:1234"})
        == "coordinator_address"
    )
    assert (
        _multihost_env_reason({"MEGASCALE_COORDINATOR_ADDRESS": "h:1"})
        == "coordinator_address"
    )
    # GKE TPU pod: >1 hostname means multi-host; a single name does not.
    assert (
        _multihost_env_reason({"TPU_WORKER_HOSTNAMES": "a,b,c"})
        == "tpu_worker_hostnames"
    )
    assert _multihost_env_reason({"TPU_WORKER_HOSTNAMES": "solo"}) is None
    assert (
        _multihost_env_reason({"TPU_PROCESS_ADDRESSES": "a:1,b:1"})
        == "tpu_process_addresses"
    )
    assert (
        _multihost_env_reason({"CLOUD_TPU_TASK_ID": "0"})
        == "cloud_tpu_task_id"
    )
    assert (
        _multihost_env_reason({"SLURM_JOB_NUM_NODES": "4"})
        == "slurm_job_num_nodes"
    )
    assert _multihost_env_reason({"SLURM_JOB_NUM_NODES": "1"}) is None
    assert (
        _multihost_env_reason({"OMPI_COMM_WORLD_SIZE": "2"})
        == "ompi_comm_world_size"
    )
    assert _multihost_env_reason({"SLURM_JOB_NUM_NODES": "weird"}) is None

    # Injectable initialize: called exactly when the table says so.
    calls = []
    assert not maybe_init_distributed(
        {}, initialize_fn=lambda: calls.append(1)
    )
    assert calls == []

    assert maybe_init_distributed(
        {"COORDINATOR_ADDRESS": "h:1"}, initialize_fn=lambda: calls.append(1)
    )
    assert calls == [1]

    # An initialize failure degrades to single-host, not a crash.
    def boom():
        raise RuntimeError("no coordinator")

    assert not maybe_init_distributed(
        {"TPU_WORKER_HOSTNAMES": "a,b"}, initialize_fn=boom
    )
