"""Benchmark: depth maps/sec on the flagship config.

Baseline (BASELINE.md): reference PT inference = 16.0 img/s, TF = 19.2 img/s
on 1x RTX 2080 Ti at 480x640 batch 1 (NYU DenseNet161). vs_baseline is
measured against the faster reference number (19.2 img/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC = 19.2  # tensorflow/README.md:72 (654 imgs / ~34 s)


def main() -> None:
    # Persistent cache only on TPU (XLA:CPU AOT cache entries are not
    # portable on this host and can hang on load).
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bts_tpu.config import Config
    from bts_tpu.models.bts import create_model, init_model

    h, w = 480, 640
    batch = 8  # batched inference (reference is batch-1)
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
        return model.apply(variables, image, focal, train=False)[4]

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32))
    focal = jnp.full((batch,), 518.8579, jnp.float32)

    # Warmup / compile.
    forward(variables, image, focal).block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(variables, image, focal)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

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
