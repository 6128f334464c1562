"""A/B the factor-update small-op variants on the real chip.

Measures, per (B, R) in the bench's bucket grid:
  * SPD inverse: XLA Cholesky chain vs unrolled Gauss-Jordan vs Pallas
    lane-batched Gauss-Jordan (each through the full update: inverse +
    apply matmul), and
  * the normalize+gramian tail: current (normalize_mode then gramian) vs
    fused (gramian of the raw update, L2 norms from its diagonal).

Same timing discipline as scripts/profile_iteration.py (chained fori_loop
through a value the kernel reads, full-output reduction, scalar fetch,
best-of-N, null round-trip subtracted).

Usage: python scripts/profile_update_variants.py [--out data/benchmarks/update_variants.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

NULL_LAT = [0.0]


def timed(fn, args, n_loop, reps=4):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(np.asarray(out).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - NULL_LAT[0], best / 10) / n_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/benchmarks/update_variants.json")
    p.add_argument("--n-loop", type=int, default=50)
    p.add_argument("--modes", default="299-301-41")
    p.add_argument("--cases", default="96-20,80-4,80-8,240-20")
    args = p.parse_args()

    from cp_cals_tpu.config import resolve_precision
    from cp_cals_tpu.ktensor import Ktensor, normalize_mode
    from cp_cals_tpu.ops.gramians import gramian
    from cp_cals_tpu.ops.pallas_solve import spd_inverse_pallas
    from cp_cals_tpu.ops.update import update_factor_unconstrained

    modes = tuple(int(m) for m in args.modes.split("-"))
    i0 = modes[0]
    dtype = jnp.float32
    prec = resolve_precision("high")
    n_loop = args.n_loop
    results = {"device": str(jax.devices()[0]), "modes": modes}
    print(results["device"], flush=True)

    @jax.jit
    def _null(a):
        return jnp.sum(a) * 1e-30

    z = jnp.zeros((8, 128), dtype)
    float(np.asarray(_null(z)))
    lat = min(
        _time_once(_null, z) for _ in range(5)
    )
    NULL_LAT[0] = lat
    results["null_roundtrip_ms"] = lat * 1e3
    print(f"null: {lat*1e3:.1f} ms", flush=True)

    def flush():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    for case in args.cases.split(","):
        b, r = (int(v) for v in case.split("-"))
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 3)
        a = jax.random.normal(ks[0], (b, r, r), dtype)
        h = jnp.einsum("brs,bts->brt", a, a) + 2.0 * r * jnp.eye(r, dtype=dtype)
        g0 = jax.random.normal(ks[1], (b, i0, r), dtype)

        def upd_loop(g0, solve):
            def step(i, g):
                u = update_factor_unconstrained(g, h, prec, solve=solve)
                return u * 0.999 + 0.001

            out = jax.lax.fori_loop(0, n_loop, step, g0)
            return jnp.sum(out[..., 0, :]) * 1e-20

        for solve in ("chol", "gj"):
            t = timed(lambda g, s=solve: upd_loop(g, s), (g0,), n_loop)
            results[f"update_{solve}_b{b}_r{r}_ms"] = t * 1e3
            print(f"update {solve:6s} B={b:<4d} R={r:<3d} {t*1e3:8.3f} ms",
                  flush=True)
            flush()

        def upd_pallas_loop(g0):
            def step(i, g):
                h_inv = spd_inverse_pallas(h)
                u = jnp.einsum("bir,brt->bit", g, h_inv, precision=prec)
                return u * 0.999 + 0.001

            out = jax.lax.fori_loop(0, n_loop, step, g0)
            return jnp.sum(out[..., 0, :]) * 1e-20

        try:
            t = timed(upd_pallas_loop, (g0,), n_loop)
            results[f"update_pallas_b{b}_r{r}_ms"] = t * 1e3
            print(f"update pallas B={b:<4d} R={r:<3d} {t*1e3:8.3f} ms",
                  flush=True)
        except Exception as e:  # Mosaic may not compile on this backend
            results[f"update_pallas_b{b}_r{r}_ms"] = None
            print(f"update pallas B={b} R={r} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        flush()

        # ---- normalize + gramian tail -------------------------------
        lam = jnp.ones((b, r), dtype)
        iters = jnp.full((b,), 5, jnp.int32)

        def tail_current(u0):
            def step(i, u):
                kt = Ktensor((u,), lam)
                kt2 = normalize_mode(kt, 0, iters)
                gm = gramian(kt2.factors[0], prec)
                return kt2.factors[0] + (
                    jnp.sum(gm, axis=-2) + kt2.lam
                )[..., None, :] * 1e-30

            out = jax.lax.fori_loop(0, n_loop, step, u0)
            return jnp.sum(out[..., 0, :]) * 1e-20

        def tail_fused(u0):
            def step(i, u):
                gm_raw = gramian(u, prec)
                l2 = jnp.sqrt(jnp.abs(jnp.diagonal(gm_raw, axis1=-2, axis2=-1)))
                mx = jnp.max(u, axis=-2)
                mn = jnp.min(u, axis=-2)
                maxval = jnp.where(mx >= -mn, mx, mn)
                lam_new = jnp.where((iters == 1)[..., None], l2, maxval)
                safe = jnp.where(lam_new != 0, lam_new, 1.0)
                f_new = u / safe[..., None, :]
                gm = gm_raw / (safe[..., :, None] * safe[..., None, :])
                return f_new + (jnp.sum(gm, axis=-2) + lam_new)[
                    ..., None, :
                ] * 1e-30

            out = jax.lax.fori_loop(0, n_loop, step, u0)
            return jnp.sum(out[..., 0, :]) * 1e-20

        for name, fn in (("current", tail_current), ("fused", tail_fused)):
            t = timed(fn, (g0,), n_loop)
            results[f"tail_{name}_b{b}_r{r}_ms"] = t * 1e3
            print(f"tail {name:8s} B={b:<4d} R={r:<3d} {t*1e3:8.3f} ms",
                  flush=True)
            flush()

    flush()
    print(f"wrote {args.out}")


def _time_once(jfn, z):
    t0 = time.perf_counter()
    float(np.asarray(jfn(z)))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
