"""Measure the per-loop-step and per-kernel-launch overhead floor on this
backend: chained fori_loops whose bodies are (a) one tiny op, (b) K
dependent tiny ops, (c) one no-op Pallas kernel, (d) one small matmul.

If every small body costs the same ~0.1 ms regardless of content, all
small-op component measurements are floor-dominated and the optimization
target is LAUNCH COUNT, not FLOPs/bytes.
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 50
NULL = [0.0]


def timed(fn, *args, reps=4):
    jfn = jax.jit(fn)
    float(np.asarray(jfn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - NULL[0], best / 10) / N


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    z = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def _null(a):
        return jnp.sum(a) * 1e-30

    float(np.asarray(_null(z)))
    lat = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(_null(z)))
        lat = min(lat, time.perf_counter() - t0)
    NULL[0] = lat
    print(f"null round-trip {lat*1e3:.1f} ms", flush=True)
    res = {"null_ms": lat * 1e3}

    small = jnp.ones((96, 20, 20), jnp.float32)
    big = jnp.ones((96, 301, 20), jnp.float32)

    def loop(body):
        def f(a):
            out = jax.lax.fori_loop(0, N, body, a)
            return jnp.sum(out) * 1e-20
        return f

    # (a) one tiny elementwise op per step
    t = timed(loop(lambda i, a: a * 0.999 + 1e-9), small)
    res["one_tiny_op_ms"] = t * 1e3
    print(f"1 tiny op/step:      {t*1e3:8.4f} ms", flush=True)

    # (b) 8 dependent tiny ops per step
    def b8(i, a):
        for k in range(8):
            a = a * 0.999 + 1e-9
            a = jnp.where(a > 2.0, a - 1.0, a)
        return a
    t = timed(loop(b8), small)
    res["eight_tiny_ops_ms"] = t * 1e3
    print(f"16 tiny ops/step:    {t*1e3:8.4f} ms", flush=True)

    # (b2) 8 dependent UNFUSABLE ops (matmul chain on small mats)
    h = jnp.eye(20, dtype=jnp.float32)[None] * 1.0001
    hB = jnp.broadcast_to(h, (96, 20, 20))
    def mm8(i, a):
        for k in range(8):
            a = jnp.einsum("bij,bjk->bik", a, hB,
                           precision=jax.lax.Precision.HIGHEST)
        return a
    t = timed(loop(mm8), small)
    res["eight_small_matmuls_ms"] = t * 1e3
    print(f"8 small matmuls/step:{t*1e3:8.4f} ms", flush=True)

    # (c) one no-op pallas kernel per step
    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 0.999

    def pall(i, a):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a)
    t = timed(loop(pall), small)
    res["one_pallas_small_ms"] = t * 1e3
    print(f"1 pallas (small)/step:{t*1e3:8.4f} ms", flush=True)

    t = timed(loop(pall), big)
    res["one_pallas_big_ms"] = t * 1e3
    print(f"1 pallas (2.3MB)/step:{t*1e3:8.4f} ms", flush=True)

    # (d) one big-factor elementwise op per step
    t = timed(loop(lambda i, a: a * 0.999 + 1e-9), big)
    res["one_big_elemwise_ms"] = t * 1e3
    print(f"1 elemwise (2.3MB)/step:{t*1e3:8.4f} ms", flush=True)

    # (e) two dependent big elementwise fusions (forced by reduction between)
    def two_big(i, a):
        s = jnp.sum(a, axis=1, keepdims=True)
        return a * 0.999 + s * 1e-9
    t = timed(loop(two_big), big)
    res["reduce_plus_elemwise_ms"] = t * 1e3
    print(f"reduce+elemwise/step:{t*1e3:8.4f} ms", flush=True)

    out = "data/benchmarks/overhead_probe.json"
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
