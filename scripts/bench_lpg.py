"""Benchmark the LPG op implementations (XLA broadcast vs Pallas kernel).

Records the data behind the `auto -> xla` default in ops/lpg.py
(VERDICT r1 asked for the decision to be backed by numbers). Shapes are
the decoder's plane-eq grids at NYU eval resolution 480x640 and train
crop 416x544, batch 16, one (upratio, grid) pair per decoder LPG site.

Timing is pipelined with host readback sync (block_until_ready is
unreliable over the axon tunnel), same methodology as bench.py.

Usage: python scripts/bench_lpg.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, args, n_iters=30):
    # fn must return a scalar (readback sync is the timing fence).
    float(fn(*args))
    float(fn(*args))
    outs = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        outs.append(fn(*args))
        if i >= 1:
            float(outs[i - 1])
    float(outs[-1])
    return (time.perf_counter() - t0) / n_iters


def main() -> None:
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bts_tpu.ops.lpg import local_planar_guidance

    B = 16
    cases = [
        # (upratio, H, W) — decoder plane grids at 480x640 and 416x544.
        (8, 60, 80),
        (4, 120, 160),
        (2, 240, 320),
        (8, 52, 68),
        (4, 104, 136),
        (2, 208, 272),
    ]
    rng = np.random.default_rng(0)
    rows = []
    for r, h, w in cases:
        raw = rng.normal(size=(B, h, w, 4)).astype(np.float32)
        # Realistic plane eqs: unit-ish normal, positive n3, positive n4.
        raw[..., 2] = np.abs(raw[..., 2]) + 0.5
        raw[..., 3] = np.abs(raw[..., 3]) + 0.5
        pe = jnp.asarray(raw)

        row = {"upratio": r, "grid": f"{h}x{w}", "batch": B}
        for impl in ("xla", "pallas"):

            @jax.jit
            def fwd(p, impl=impl, r=r):
                return jnp.sum(local_planar_guidance(p, r, impl=impl))

            @jax.jit
            def fwdbwd(p, impl=impl, r=r):
                g = jax.grad(
                    lambda q: jnp.sum(
                        local_planar_guidance(q, r, impl=impl) ** 2
                    )
                )(p)
                return jnp.sum(g)

            row[f"{impl}_fwd_us"] = round(time_fn(fwd, (pe,)) * 1e6, 1)
            row[f"{impl}_fwdbwd_us"] = round(time_fn(fwdbwd, (pe,)) * 1e6, 1)
        # Roofline context: bytes = read 4HW + write HW*r^2 floats.
        out_bytes = B * h * w * (4 + r * r) * 4
        row["fwd_roofline_us_at_819GBps"] = round(out_bytes / 819e9 * 1e6, 1)
        rows.append(row)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
