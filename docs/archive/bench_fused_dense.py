"""Microbenchmark: fused dense-layer Pallas kernel vs the XLA chain.

Times one dense layer (BN-ReLU-1x1-BN-ReLU-3x3) at block1/block2 shapes of
DenseNet161 480x640 b64, checks numerics against the unfused chain, prints
per-layer ms for each variant.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.ops.fused_dense import (
    fold_bn,
    fused_dense_layer,
    fused_dense_layer_eo,
    pack_w2_eo,
)


def xla_chain(x, s1, b1, w1, s2, b2, w2):
    dt = x.dtype
    y = jnp.maximum(x * s1.astype(dt) + b1.astype(dt), 0)
    t = jax.lax.conv_general_dilated(
        y,
        w1[None, None].astype(dt),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    z = jnp.maximum(t * s2.astype(dt) + b2.astype(dt), 0)
    return jax.lax.conv_general_dilated(
        z,
        w2.astype(dt),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


INNER = 16  # repetitions inside one jit — the ~40 ms axon dispatch
# latency would otherwise swamp single-op timings.


def timeit(fn, *args, iters=4, delay=2):
    def loop(*a):
        x = a[0]

        def body(i, acc):
            # tiny input perturbation defeats CSE; its cost (~one x
            # read+write) is identical across variants.
            xi = x * (1.0 + 1e-6 * i)
            return acc + jnp.sum(fn(xi, *a[1:]).astype(jnp.float32))

        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    looped = jax.jit(loop)
    outs = []
    float(looped(*args))
    float(looped(*args))
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(looped(*args))
        if i >= delay:
            float(outs[i - delay])
    for o in outs[iters - delay:]:
        float(o)
    return (time.perf_counter() - t0) / (iters * INNER) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    shapes = [
        ("block1-L6", (args.batch, 120, 160, 336), 192, 48),
        ("block2-L12", (args.batch, 60, 80, 720), 192, 48),
        ("block3-L36", (args.batch, 30, 40, 2064), 192, 48),
    ]
    for name, xshape, cmid, g in shapes:
        c = xshape[-1]
        x = jnp.asarray(
            rng.normal(size=xshape).astype(np.float32), jnp.bfloat16
        )
        gam1, bet1 = rng.normal(size=(2, c)).astype(np.float32)
        mean1 = rng.normal(size=c).astype(np.float32)
        var1 = rng.uniform(0.5, 2.0, c).astype(np.float32)
        gam2, bet2 = rng.normal(size=(2, cmid)).astype(np.float32)
        mean2 = rng.normal(size=cmid).astype(np.float32)
        var2 = rng.uniform(0.5, 2.0, cmid).astype(np.float32)
        w1 = (rng.normal(size=(c, cmid)) * 0.05).astype(np.float32)
        w2 = (rng.normal(size=(3, 3, cmid, g)) * 0.05).astype(np.float32)
        s1, b1 = fold_bn(
            jnp.asarray(gam1), jnp.asarray(bet1), jnp.asarray(mean1),
            jnp.asarray(var1), 1e-5,
        )
        s2, b2 = fold_bn(
            jnp.asarray(gam2), jnp.asarray(bet2), jnp.asarray(mean2),
            jnp.asarray(var2), 1e-5,
        )
        w1j, w2j = jnp.asarray(w1), jnp.asarray(w2)
        w2q = pack_w2_eo(w2j.astype(jnp.bfloat16))

        ref_fn = jax.jit(xla_chain)
        ref = ref_fn(x, s1, b1, w1j, s2, b2, w2j)
        r = np.asarray(ref, np.float32)
        scale = np.abs(r).max()
        t_xla = timeit(ref_fn, x, s1, b1, w1j, s2, b2, w2j)
        line = f"{name}: xla {t_xla:7.2f} ms"

        def run_taps(x, s1, b1, w1, s2, b2, w2):
            return fused_dense_layer(x, s1, b1, w1, s2, b2, w2)

        def run_eo(x, s1, b1, w1, s2, b2, w2q):
            xe, xo = x[:, :, 0::2, :], x[:, :, 1::2, :]
            out = fused_dense_layer_eo(xe, xo, s1, b1, w1, s2, b2, w2q)
            b_, h_, u_, g2_ = out.shape
            g_ = g2_ // 2
            # interleave even/odd columns back: (B,H,U,2,G)->(B,H,W,G)
            return out.reshape(b_, h_, u_, 2, g_).reshape(b_, h_, 2 * u_, g_)

        for variant, fn, w2v in (("taps", run_taps, w2j), ("eo", run_eo, w2q)):
            try:
                got = fn(x, s1, b1, w1j, s2, b2, w2v)
                err = np.abs(r - np.asarray(got, np.float32)).max() / scale
                t = timeit(fn, x, s1, b1, w1j, s2, b2, w2v)
                line += (
                    f"  {variant} {t:7.2f} ms ({t_xla / t:4.2f}x,"
                    f" err {err:.1e})"
                )
            except Exception as e:
                line += f"  {variant} FAILED ({type(e).__name__}: {str(e)[:120]})"
        print(line)


if __name__ == "__main__":
    main()
