"""Training-step throughput benchmark (sync-honest, pipelined).

Methodology matches bench.py: dispatch step N, read back step N-1's loss
(a host readback is the only trustworthy sync on this host), so the ~30ms
tunnel sync overlaps device compute — exactly what training/loop.py does.

Reference hot loop being measured against: pytorch/bts_main.py:439-466
(the reference trains NYU DenseNet161 at 416x544 batch 4/GPU).

Usage: python scripts/bench_train.py [--batch 16] [--steps 30]
       [--encoder densenet161_bts] [--height 416] [--width 544]
       [--no_device_augment] [--remat]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--encoder", default="densenet161_bts")
    ap.add_argument("--dataset", default="nyu", choices=["nyu", "kitti"])
    ap.add_argument("--height", type=int, default=416)
    ap.add_argument("--width", type=int, default=544)
    ap.add_argument(
        "--bf16_moments",
        action="store_true",
        help="store the Adam first moment (mu) in bfloat16 (~25% of "
        "moment-state HBM; nu stays f32 — optax mu_dtype)",
    )
    ap.add_argument("--raw_height", type=int, default=480)
    ap.add_argument("--raw_width", type=int, default=640)
    ap.add_argument("--no_device_augment", action="store_true")
    ap.add_argument("--no_fast_tail", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_policy", default="conv", choices=["conv", "full"])
    ap.add_argument("--remat_scope", default="encoder", choices=["encoder", "all"])
    ap.add_argument("--profile_dir", default="")
    ap.add_argument(
        "--delay",
        type=int,
        default=3,  # matches the train driver's depth-3 pipelined readback
        help="readback delay in steps (pipeline depth)",
    )
    args = ap.parse_args()

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bts_tpu.config import Config
    from bts_tpu.models.bts import create_model, init_model
    from bts_tpu.parallel.mesh import make_mesh, shard_batch
    from bts_tpu.training.optim import create_optimizer
    from bts_tpu.training.state import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )

    device_augment = not args.no_device_augment
    cfg = Config(
        encoder=args.encoder,
        dataset=args.dataset,
        max_depth=10.0 if args.dataset == "nyu" else 80.0,
        adam_bf16_moments=args.bf16_moments,
        compute_dtype="bfloat16",
        batch_size=args.batch,
        input_height=args.height,
        input_width=args.width,
        device_augment=device_augment,
        fast_tail=not args.no_fast_tail,
        remat=args.remat,
        remat_policy=args.remat_policy,
        remat_scope=args.remat_scope,
    )
    model = create_model(cfg)
    params, batch_stats = init_model(
        model, jax.random.key(0), (1, args.height, args.width, 3)
    )
    mesh = make_mesh(cfg.num_devices, cfg.mesh_axis_name)
    tx, _ = create_optimizer(cfg, params, num_total_steps=10_000)
    state = create_train_state(params, batch_stats, tx, mesh=mesh)
    train_step = jit_train_step(
        make_train_step(model, tx, cfg), mesh, cfg.mesh_axis_name
    )

    # Two rotating host batches (CLAUDE.md: big transfers ride the tunnel;
    # 2 buffers = same pattern the loader's prefetch window produces).
    rng = np.random.default_rng(0)
    src_h, src_w = (
        (args.raw_height, args.raw_width)
        if device_augment
        else (args.height, args.width)
    )
    host_batches = []
    for _ in range(2):
        host_batches.append(
            {
                "image": rng.random((args.batch, src_h, src_w, 3), np.float32),
                "depth": (
                    rng.random((args.batch, src_h, src_w, 1), np.float32) * 9.9
                    + 0.1
                ),
                "focal": np.full((args.batch,), 518.8579, np.float32),
            }
        )
    device_batches = [
        shard_batch(b, mesh, cfg.mesh_axis_name) for b in host_batches
    ]

    # Warmup / compile.
    state, m = train_step(state, device_batches[0])
    float(m["loss"])
    state, m = train_step(state, device_batches[1])
    float(m["loss"])

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    from collections import deque

    pending = deque()
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = train_step(state, device_batches[i % 2])
        pending.append(metrics)
        if len(pending) > args.delay:
            float(pending.popleft()["loss"])
    while pending:
        float(pending.popleft()["loss"])
    elapsed = time.perf_counter() - t0

    if args.profile_dir:
        jax.profiler.stop_trace()
        print(f"trace -> {args.profile_dir}")

    # Regression reference: round-2 measured 106 ex/s at the default
    # config (densenet161 416x544 b16, delay-3 pipelined readback) on one
    # v5e chip. The reference project publishes no training throughput, so
    # the previous round's own number is the baseline.
    R02_BASELINE_EX_PER_SEC = 106.0
    ex_per_sec = args.batch * args.steps / elapsed
    print(
        json.dumps(
            {
                "metric": f"train_step_{args.encoder}_{args.height}x{args.width}_b{args.batch}",
                "value": round(ex_per_sec, 2),
                "unit": "examples/s",
                "vs_baseline": round(ex_per_sec / R02_BASELINE_EX_PER_SEC, 2),
                "ms_per_step": round(elapsed / args.steps * 1000, 2),
                "device_augment": device_augment,
            }
        )
    )


if __name__ == "__main__":
    main()
