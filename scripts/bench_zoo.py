"""Per-encoder pipelined inference benchmark (the README zoo table).

Usage: python scripts/bench_zoo.py [encoder ...]   (default: full zoo)
Optional flags: --height/--width/--batch/--dataset.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ZOO = [
    "densenet121_bts",
    "densenet161_bts",
    "resnet50_bts",
    "resnet101_bts",
    "resnext50_bts",
    "resnext101_bts",
    "mobilenetv2_bts",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("encoders", nargs="*", default=None)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    # 128 is the layout sweet spot on v5e (batch-minor tiling; see
    # docs/DESIGN.md "Batch 128: the layout cliff").
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dataset", default="nyu")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--delay", type=int, default=4)
    ap.add_argument(
        "--profile_dir",
        default=None,
        help="capture a jax.profiler trace of the timed iterations "
        "(analyze with scripts/profile_ops.py)",
    )
    args = ap.parse_args()

    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bts_tpu.config import Config
    from bts_tpu.models.bts import create_model, init_model

    h, w, batch = args.height, args.width, args.batch
    rng = np.random.default_rng(0)
    images = [
        jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32))
        for _ in range(2)
    ]
    focal = jnp.full((batch,), 518.8579, jnp.float32)

    for enc in args.encoders or ZOO:
        cfg = Config(
            encoder=enc,
            dataset=args.dataset,
            max_depth=10.0 if args.dataset == "nyu" else 80.0,
            compute_dtype="bfloat16",
        )
        model = create_model(cfg)
        params, batch_stats = init_model(model, jax.random.key(0), (1, h, w, 3))
        variables = {"params": params, "batch_stats": batch_stats}

        @jax.jit
        def forward(variables, image, focal, model=model):
            return jnp.sum(model.apply(variables, image, focal, train=False)[4])

        float(forward(variables, images[0], focal))
        float(forward(variables, images[1], focal))
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        outs = []
        t0 = time.perf_counter()
        for i in range(args.iters):
            outs.append(forward(variables, images[i % 2], focal))
            if i >= args.delay:
                float(outs[i - args.delay])
        for o in outs[args.iters - args.delay :]:
            float(o)
        elapsed = time.perf_counter() - t0
        if args.profile_dir:
            jax.profiler.stop_trace()
            print(f"trace -> {args.profile_dir}")
        print(
            json.dumps(
                {
                    "encoder": enc,
                    "img_per_s": round(batch * args.iters / elapsed, 1),
                    "shape": f"{h}x{w}",
                    "batch": batch,
                }
            )
        )


if __name__ == "__main__":
    main()
