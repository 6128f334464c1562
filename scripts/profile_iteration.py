"""Component-level device profile of the CALS iteration on the real chip.

The analog of the reference's per-phase timer matrices + peak evaluator
(`/root/reference/include/timer.h:29-52`, `src/experiments/peak_evaluator.cpp`)
for an async/tunneled TPU. Measurement rules this environment forces
(violating any one of them produces fiction):

1. Chain the program n_loop times inside ONE jitted fori_loop whose carry
   the kernel actually READS — otherwise XLA hoists the kernel out of the
   loop and you time one call plus n_loop no-ops.
2. Return a SCALAR computed on device and fetch only that — fetching any
   array pays the ~20-40 MB/s tunnel, swamping kernel time; and
   block_until_ready is a no-op here, only a real fetch syncs.
3. Best-of-reps: the shared chip's throughput varies run to run.
4. Subtract the measured null round-trip (dispatch+fetch latency) before
   dividing by n_loop.

Usage:
  python scripts/profile_iteration.py [--modes 299-301-41] [--batch 96]
      [--rank 20] [--out data/benchmarks/profile.json]
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

NULL_LAT = [0.0]  # seconds, measured at startup


def timed(fn, args, n_loop, reps=3):
    """Compile fn (must return a scalar), then best-of-reps wall per inner
    loop iteration, synced by the scalar fetch, de-biased by the null
    round-trip latency."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(np.asarray(out).ravel()[0])  # compile+sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - NULL_LAT[0], best / 10) / n_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="299-301-41")
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--rank", type=int, default=20)
    p.add_argument("--n-loop", type=int, default=20)
    p.add_argument("--out", default="data/benchmarks/profile.json")
    p.add_argument("--skip-peaks", action="store_true")
    p.add_argument("--skip-iteration", action="store_true")
    p.add_argument("--skip-mttkrp", action="store_true")
    p.add_argument("--components", action="store_true",
                   help="profile the update-path components (cholesky "
                        "solve, gramian, normalize, df64 error)")
    p.add_argument("--precisions", default="high",
                   help="comma list of matmul precisions to profile")
    p.add_argument("--epilogue", default="auto",
                   help="iteration epilogue: auto | fused | xla")
    p.add_argument("--mttkrp-precision", default=None,
                   help="MTTKRP-only precision override")
    args = p.parse_args()

    from cp_cals_tpu.config import CalsParams, resolve_precision
    from cp_cals_tpu.ktensor import Ktensor
    from cp_cals_tpu.ops.mttkrp import (
        als_iteration_flops,
        mttkrp_batched,
        mttkrp_flops,
        prepare_batched,
    )
    from cp_cals_tpu.solvers.iteration import make_iteration
    from cp_cals_tpu.solvers.state import init_state

    modes = tuple(int(m) for m in args.modes.split("-"))
    b, r = args.batch, args.rank
    n_loop = args.n_loop
    dtype = jnp.float32
    dev = jax.devices()[0]
    print(f"device: {dev} | modes {modes} batch {b} rank {r}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, len(modes) + 1)
    x = jax.random.normal(ks[0], modes, dtype)
    factors = tuple(
        jax.random.normal(k, (b, m, r), dtype) * 0.1
        for k, m in zip(ks[1:], modes)
    )
    kt = Ktensor(factors, jnp.ones((b, r), dtype))
    x_norm = jnp.linalg.norm(x.ravel())

    results = {"modes": modes, "batch": b, "rank": r, "device": str(dev)}

    def flush_results():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    # ---- null round-trip (dispatch + scalar fetch over the tunnel) -----
    @jax.jit
    def _null(a):
        return jnp.sum(a) * 1e-30

    z = jnp.zeros((8, 128), dtype)
    float(np.asarray(_null(z)))
    lat = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(_null(z)))
        lat = min(lat, time.perf_counter() - t0)
    NULL_LAT[0] = lat
    results["null_roundtrip_ms"] = lat * 1e3
    print(f"null dispatch+fetch round-trip: {lat*1e3:.2f} ms", flush=True)
    flush_results()

    # ---- full production iteration (state chained on itself) -----------
    if not args.skip_iteration:
        params = CalsParams(precision="high", force_max_iter=True,
                            max_iterations=10**9,
                            epilogue=args.epilogue,
                            mttkrp_precision=args.mttkrp_precision)
        iteration = make_iteration(params, batched=True)
        prepared = iteration.prepare(x)
        state0 = init_state(kt, x_norm)

        def iter_chain(s0):
            def step(i, s):
                return iteration(x, s, x_norm, prepared)

            final = jax.lax.fori_loop(0, n_loop, step, s0)
            return final.fit[0]

        t = timed(iter_chain, (state0,), n_loop)
        flops = als_iteration_flops(modes, r, b)
        results["iteration_ms"] = t * 1e3
        results["iteration_tflops"] = flops / t / 1e12
        print(f"iteration: {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TF/s",
              flush=True)
        flush_results()

    # ---- per-mode MTTKRP, each method ----------------------------------
    if not args.skip_mttkrp:
        for prec_name in tuple(args.precisions.split(",")):
            prec = resolve_precision(prec_name)
            for mode in range(len(modes)):
                for method in ("krp_gemm", "twostep"):
                    prep = prepare_batched(
                        x, tuple(method for _ in modes)
                    )
                    # Chain through a factor the kernel READS (first
                    # non-target mode): chaining the target factor leaves
                    # the MTTKRP loop-invariant and XLA hoists it.
                    other = [m for m in range(len(modes)) if m != mode][0]

                    def loop(fo0, mode=mode, method=method, prec=prec,
                             prep=prep, other=other):
                        def step(i, fo):
                            fs = list(factors)
                            fs[other] = fo
                            g = mttkrp_batched(
                                x, tuple(fs), mode, method, prec,
                                prep[mode],
                            )
                            # Reduce over the FULL output: a slice here
                            # would let XLA narrow the matmul to one row
                            # (dead-code-eliminating the work being timed).
                            return fo + jnp.sum(
                                g, axis=-2, keepdims=True
                            ) * 1e-30

                        out = jax.lax.fori_loop(0, n_loop, step,
                                                factors[other])
                        return jnp.sum(out[..., 0, :]) * 1e-20

                    t = timed(loop, (factors[other],), n_loop)
                    fl = mttkrp_flops(modes, r, mode, b)
                    key_ = f"mttkrp_m{mode}_{method}_{prec_name}"
                    results[key_] = {"ms": t * 1e3,
                                     "tflops": fl / t / 1e12}
                    print(
                        f"{key_:38s} {t*1e3:8.2f} ms  "
                        f"{fl/t/1e12:6.2f} TF/s",
                        flush=True,
                    )
                    flush_results()

    # ---- update-path components ----------------------------------------
    if args.components:
        from cp_cals_tpu.ktensor import normalize_mode
        from cp_cals_tpu.ops.error import fast_error
        from cp_cals_tpu.ops.gramians import gramian, hadamard_all
        from cp_cals_tpu.ops.update import update_factor_unconstrained

        prec = resolve_precision("high")
        h0 = jnp.eye(r, dtype=dtype) + 0.01 * jnp.ones((r, r), dtype)
        h0 = jnp.broadcast_to(h0, (b, r, r))
        i1 = modes[1]

        def upd_loop(g0):
            def step(i, g):
                u = update_factor_unconstrained(g, h0, prec)
                return u * 0.999 + 0.001

            out = jax.lax.fori_loop(0, n_loop, step, g0)
            return jnp.sum(out[..., 0, :]) * 1e-20

        g0 = jax.random.normal(ks[1], (b, i1, r), dtype)
        t = timed(upd_loop, (g0,), n_loop)
        results["update_cholesky_solve_ms"] = t * 1e3
        print(f"update (chol+solve) [B,{i1},{r}]: {t*1e3:8.3f} ms",
              flush=True)
        flush_results()

        def gram_loop(u0):
            def step(i, u):
                g = gramian(u, prec)
                return u + jnp.sum(g, axis=-2)[..., None, :] * 1e-30

            out = jax.lax.fori_loop(0, n_loop, step, u0)
            return jnp.sum(out[..., 0, :]) * 1e-20

        t = timed(gram_loop, (g0,), n_loop)
        results["gramian_ms"] = t * 1e3
        print(f"gramian [B,{i1},{r}]: {t*1e3:8.3f} ms", flush=True)
        flush_results()

        def norm_loop(f0):
            def step(i, f):
                kt2 = Ktensor((f,) + kt.factors[1:], kt.lam)
                kt3 = normalize_mode(kt2, 0, jnp.int32(5))
                return kt3.factors[0] + kt3.lam[..., :1, None] * 1e-30

            out = jax.lax.fori_loop(0, n_loop, step, f0)
            return jnp.sum(out[..., 0, :]) * 1e-20

        t = timed(norm_loop, (factors[0],), n_loop)
        results["normalize_ms"] = t * 1e3
        print(f"normalize_mode [B,{modes[0]},{r}]: {t*1e3:8.3f} ms",
              flush=True)
        flush_results()

        gh = jnp.broadcast_to(jnp.eye(r, dtype=dtype), (b, r, r))

        def err_loop(gl0):
            def step(i, gl):
                e = fast_error(x_norm, kt.lam, kt.factors[-1], gl, gh)
                return gl + e[..., None, None] * 1e-30

            out = jax.lax.fori_loop(0, n_loop, step, gl0)
            return jnp.sum(out[..., 0, :]) * 1e-20

        gl0 = jax.random.normal(ks[2], (b, modes[-1], r), dtype)
        t = timed(err_loop, (gl0,), n_loop)
        results["fast_error_df_ms"] = t * 1e3
        print(f"fast_error (df64) [B,{modes[-1]},{r}]: {t*1e3:8.3f} ms",
              flush=True)
        flush_results()

    # ---- roofline probes ----------------------------------------------
    if not args.skip_peaks:
        p_ = int(np.prod(modes[1:]))
        xu = jnp.asarray(np.random.default_rng(0).normal(
            size=(modes[0], p_)), dtype)
        krp = jnp.asarray(np.random.default_rng(1).normal(
            size=(p_, b * r)), dtype)

        for prec_name in ("high", "highest", "default"):
            prec = resolve_precision(prec_name)

            def loop_mm(a, prec=prec):
                def step(i, aa):
                    g = jnp.matmul(aa, krp, precision=prec)
                    return aa + jnp.sum(g, axis=1, keepdims=True) * 1e-30

                out = jax.lax.fori_loop(0, n_loop, step, a)
                return jnp.sum(out[:, 0]) * 1e-20

            t = timed(loop_mm, (xu,), n_loop)
            fl = 2 * modes[0] * p_ * b * r
            results[f"pure_matmul_{prec_name}"] = {
                "ms": t * 1e3, "tflops": fl / t / 1e12,
            }
            print(
                f"pure_matmul [{modes[0]},{p_}]x[{p_},{b*r}] {prec_name}: "
                f"{t*1e3:8.2f} ms  {fl/t/1e12:6.2f} TF/s",
                flush=True,
            )
            flush_results()

        # absolute MXU peak probe: big square bf16 matmul
        a16 = jnp.asarray(np.random.default_rng(2).normal(
            size=(4096, 4096)), jnp.bfloat16)

        def loop_peak(a):
            def step(i, aa):
                g = jnp.matmul(aa, a16, preferred_element_type=jnp.float32)
                return aa + (
                    jnp.sum(g, axis=1, keepdims=True) * 1e-30
                ).astype(jnp.bfloat16)

            out = jax.lax.fori_loop(0, n_loop, step, a)
            return (jnp.sum(out[0, :].astype(jnp.float32)) * 1e-20)

        t = timed(loop_peak, (a16,), n_loop)
        fl = 2 * 4096**3
        results["peak_bf16_4096"] = {"ms": t * 1e3, "tflops": fl / t / 1e12}
        print(f"peak bf16 4096^3: {t*1e3:8.2f} ms  {fl/t/1e12:6.2f} TF/s",
              flush=True)

    flush_results()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
