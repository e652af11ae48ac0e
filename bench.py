"""Benchmark: depth maps/sec on the flagship config.

Baseline (BASELINE.md): reference PT inference = 16.0 img/s, TF = 19.2 img/s
on 1x RTX 2080 Ti at 480x640 batch 1 (NYU DenseNet161). vs_baseline is
measured against the faster reference number (19.2 img/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC = 19.2  # tensorflow/README.md:72 (654 imgs / ~34 s)


def lpg_check() -> None:
    """Off-path kernel regression (round-end checklist item): exactness +
    timing of `--lpg_impl pallas --no-fast_tail` vs the production default
    (fast_tail + auto->xla). Keeps the tested-but-unreachable Pallas kernel
    honest — prints one JSON line per variant plus a max-abs-diff line.
    Run on the real TPU: `python bench.py --lpg-check`.
    """
    from bts_tpu.config import Config
    from bts_tpu.models.bts import create_model, init_model

    h, w, batch = 480, 640, 64
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32))
    focal = jnp.full((batch,), 518.8579, jnp.float32)

    outs = {}
    times = {}
    for name, kw in (
        ("default", dict()),
        ("pallas_slow_tail", dict(lpg_impl="pallas", fast_tail=False)),
    ):
        cfg = Config(
            encoder="densenet161_bts",
            dataset="nyu",
            max_depth=10.0,
            compute_dtype="bfloat16",
            **kw,
        )
        model = create_model(cfg)
        params, batch_stats = init_model(model, jax.random.key(0), (1, h, w, 3))
        variables = {"params": params, "batch_stats": batch_stats}
        fwd = jax.jit(
            lambda v, im, f, m=model: m.apply(v, im, f, train=False)[4]
        )
        out = np.asarray(fwd(variables, image, focal))  # compile+readback
        outs[name] = out
        n_iters, delay, pend = 8, 2, []
        t0 = time.perf_counter()
        for i in range(n_iters):
            pend.append(jnp.sum(fwd(variables, image, focal)))
            if i >= delay:
                float(pend[i - delay])
        for o in pend[n_iters - delay:]:
            float(o)
        times[name] = batch * n_iters / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"lpg_check_{name}",
            "value": round(times[name], 2),
            "unit": "img/s",
        }))
    diff = float(np.abs(outs["default"] - outs["pallas_slow_tail"]).max())
    # Same math, different float reassociation + bf16 tails: ~1e-2 m on a
    # 10 m range is the expected bf16 noise band.
    print(json.dumps({"metric": "lpg_check_max_abs_diff_m", "value": diff}))
    assert diff < 0.15, f"pallas/no-fast-tail diverged: {diff} m"


def main() -> None:
    # Optional: `python bench.py --profile_dir /tmp/trace_inf` wraps the
    # timed loop in a jax.profiler trace (parse with scripts/profile_ops.py).
    profile_dir = ""
    if "--profile_dir" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("--profile_dir") + 1]
    if "--lpg-check" in sys.argv:
        if jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        lpg_check()
        return
    # Persistent cache only on TPU (XLA:CPU AOT cache entries are not
    # portable on this host and can hang on load).
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bts_tpu.config import Config
    from bts_tpu.models.bts import create_model, init_model

    h, w = 480, 640
    # Batched inference (reference is batch-1). 128 is load-bearing: with
    # B=128 XLA picks batch-minor layouts (batch fills the 128-lane tile
    # exactly), which un-pads every narrow-channel tensor in the model —
    # measured 267 -> 394 img/s vs batch 64 (batch 96: 274, 160: 253).
    batch = 128
    cfg = Config(
        encoder="densenet161_bts",
        dataset="nyu",
        max_depth=10.0,
        compute_dtype="bfloat16",
    )
    model = create_model(cfg)
    params, batch_stats = init_model(model, jax.random.key(0), (1, h, w, 3))
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def forward(variables, image, focal):
        # Reduce to a scalar on-device so the sync transfer is 4 bytes; the
        # full depth map stays on device (serving would consume it there).
        depth = model.apply(variables, image, focal, train=False)[4]
        return jnp.sum(depth)

    rng = np.random.default_rng(0)
    images = [
        jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32))
        for _ in range(2)
    ]
    focal = jnp.full((batch,), 518.8579, jnp.float32)

    # Warmup / compile. NOTE: on the tunneled device block_until_ready is
    # unreliable; a host readback (float()) is the only trustworthy sync.
    float(forward(variables, images[0], focal))
    float(forward(variables, images[1], focal))

    # Pipelined throughput: keep the device queue a few steps deep, sync
    # via a delayed scalar readback so dispatch overlaps execution (depth 3
    # measured to close the host dispatch gap exactly; see
    # scripts/bench_train.py --delay).
    n_iters = 16
    delay = 3
    outs = []
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for i in range(n_iters):
        outs.append(forward(variables, images[i % len(images)], focal))
        if i >= delay:
            float(outs[i - delay])
    for o in outs[n_iters - delay :]:
        float(o)
    elapsed = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"trace -> {profile_dir}", file=sys.stderr)
    imgs_per_sec = batch * n_iters / elapsed
    print(
        json.dumps(
            {
                "metric": "nyu_densenet161_inference_480x640",
                "value": round(imgs_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / REFERENCE_IMG_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
