"""Benchmark the LPG op implementations (XLA broadcast vs Pallas kernel).

Records the data behind the `auto -> xla` default in ops/lpg.py
(VERDICT r1 asked for the decision to be backed by numbers). Shapes are
the decoder's plane-eq grids at NYU eval resolution 480x640 and train
crop 416x544, batch 16, one (upratio, grid) pair per decoder LPG site.

Methodology: these kernels are 20-50us at roofline while a host readback
over the axon tunnel costs ~30ms, so per-dispatch timing only measures
the tunnel. Instead, each sample jits a lax.scan that chains K
applications with a data dependency (carry += 1e-30 * <output scalar>),
and the per-iteration time is (t(K2) - t(K1)) / (K2 - K1) — constant
dispatch/readback costs cancel. The forward number includes one full
reduction of the output (the dependency), so compare impls against each
other, not against the write-only roofline (the reduction re-reads the
output once: ~2x the write traffic).

Usage: python scripts/bench_lpg.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

K1, K2 = 64, 512
REPS = 5


def _time_scan(build_scan, pe):
    """build_scan(k) -> jitted fn(pe) -> scalar, running the op k times."""
    times = {}
    for k in (K1, K2):
        fn = build_scan(k)
        float(fn(pe))  # compile
        best = np.inf
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(pe))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[K2] - times[K1]) / (K2 - K1)


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
    for r, h, w in cases:
        raw = rng.normal(size=(B, h, w, 4)).astype(np.float32)
        # Realistic plane eqs: unit-ish normal, positive n3, positive n4.
        raw[..., 2] = np.abs(raw[..., 2]) + 0.5
        raw[..., 3] = np.abs(raw[..., 3]) + 0.5
        pe = jnp.asarray(raw)

        row = {"upratio": r, "grid": f"{h}x{w}", "batch": B}
        for impl in ("xla", "pallas"):

            def build_fwd(k, impl=impl, r=r):
                @jax.jit
                def fn(p):
                    def step(carry, _):
                        d = local_planar_guidance(carry, r, impl=impl)
                        return carry + 1e-30 * jnp.sum(d), ()

                    out, _ = jax.lax.scan(step, p, None, length=k)
                    return jnp.sum(out)

                return fn

            def build_fwdbwd(k, impl=impl, r=r):
                vjp = jax.grad(
                    lambda q: jnp.sum(
                        local_planar_guidance(q, r, impl=impl) ** 2
                    )
                )

                @jax.jit
                def fn(p):
                    def step(carry, _):
                        return carry + 1e-30 * vjp(carry), ()

                    out, _ = jax.lax.scan(step, p, None, length=k)
                    return jnp.sum(out)

                return fn

            row[f"{impl}_fwd_us"] = round(_time_scan(build_fwd, pe) * 1e6, 1)
            row[f"{impl}_fwdbwd_us"] = round(
                _time_scan(build_fwdbwd, pe) * 1e6, 1
            )
        # Roofline context: bytes = read 4HW + write HW*r^2 + re-read
        # HW*r^2 (the dependency reduction) floats.
        out_bytes = B * h * w * (4 + 2 * r * r) * 4
        row["fwd_roofline_us_at_819GBps"] = round(out_bytes / 819e9 * 1e6, 1)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
