"""Cumulative ablation of the CALS iteration body: time the loop with the
body progressively extended (mttkrp-only -> +solve -> +normalize/gramian ->
+error -> full), all in ONE process so shared-chip noise cancels.

The per-step floor on this backend is ~0.05 ms regardless of body content
(scripts/probe_overhead.py), so DIFFERENCES between stages are the real
per-phase costs; absolute numbers include the floor once.
"""

import sys, os, time, json, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

NULL = [0.0]


def timed(fn, *args, n_loop, reps=4):
    jfn = jax.jit(fn)
    float(np.asarray(jfn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - NULL[0], best / 10) / n_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="299-301-41")
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--rank", type=int, default=20)
    p.add_argument("--n-loop", type=int, default=20)
    p.add_argument("--precision", default="high")
    p.add_argument("--apply-precision", default=None,
                   help="override precision of the solve-apply einsum")
    p.add_argument("--out", default="data/benchmarks/ablation.json")
    args = p.parse_args()

    from cp_cals_tpu.config import resolve_precision
    from cp_cals_tpu.ktensor import Ktensor, normalize_factor_fused
    from cp_cals_tpu.ops.error import fast_error
    from cp_cals_tpu.ops.gramians import hadamard_all, hadamard_but_one, gramians
    from cp_cals_tpu.ops.mttkrp import mttkrp_batched, prepare_batched
    from cp_cals_tpu.ops.update import (
        gj_inverse, padded_hadamard, update_factor_unconstrained,
    )

    modes = tuple(int(m) for m in args.modes.split("-"))
    b, r, n_loop = args.batch, args.rank, args.n_loop
    dtype = jnp.float32
    prec = resolve_precision(args.precision)
    aprec = resolve_precision(args.apply_precision or args.precision)
    print(f"device: {jax.devices()[0]} modes {modes} B={b} R={r} "
          f"prec={args.precision} apply={args.apply_precision}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, len(modes) + 1)
    x = jax.random.normal(ks[0], modes, dtype)
    factors = tuple(
        jax.random.normal(k, (b, m, r), dtype) * 0.1
        for k, m in zip(ks[1:], modes)
    )
    lam0 = jnp.ones((b, r), dtype)
    x_norm = jnp.linalg.norm(x.ravel())
    mask = jnp.ones((b, r), bool)
    iters5 = jnp.full((b,), 5, jnp.int32)
    prepared = prepare_batched(x, ("twostep",) * len(modes))

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
    NULL[0] = lat
    res = {"null_ms": lat * 1e3, "precision": args.precision,
           "apply_precision": args.apply_precision}
    print(f"null {lat*1e3:.1f} ms", flush=True)

    n_modes = len(modes)

    def body(stage):
        """stage: 1 mttkrp-only, 2 +solve, 3 +normalize/gramian, 4 +error."""

        def step(i, carry):
            fs, lam, grams, acc = carry
            g_last = None
            for n in range(n_modes):
                g = mttkrp_batched(x, fs, n, "twostep", prec, prepared[n])
                if n == n_modes - 1:
                    g_last = g
                if stage == 1:
                    # consume g, keep factors evolving slightly
                    fs = tuple(
                        f if m != n else f * 0.999 + g * 1e-12
                        for m, f in enumerate(fs)
                    )
                    continue
                h = padded_hadamard(hadamard_but_one(grams, n), mask)
                u = update_factor_unconstrained(g, h, aprec)
                if stage == 2:
                    fs = tuple(
                        f if m != n else u * 1e-12 + f * 0.999
                        for m, f in enumerate(fs)
                    )
                    continue
                f_new, lam_new, gm = normalize_factor_fused(u, iters5, prec)
                fs = tuple(f_new if m == n else f for m, f in enumerate(fs))
                lam = lam_new
                grams = tuple(gm if m == n else gg
                              for m, gg in enumerate(grams))
            if stage >= 4:
                err = fast_error(x_norm, lam, fs[-1], g_last,
                                 hadamard_all(grams))
                acc = acc + jnp.sum(err) * 1e-20
            return fs, lam, grams, acc

        def run(f0):
            fs0 = (f0,) + factors[1:]
            grams0 = gramians(fs0, prec)
            fs, lam, grams, acc = jax.lax.fori_loop(
                0, n_loop, step, (fs0, lam0, grams0, jnp.zeros((), dtype))
            )
            return sum(jnp.sum(f[..., 0, :]) for f in fs) * 1e-20 + acc

        return run

    names = {1: "mttkrp_only", 2: "plus_solve", 3: "plus_norm_gram",
             4: "full_with_error"}
    prev = 0.0
    for stage in (1, 2, 3, 4):
        t = timed(body(stage), factors[0], n_loop=n_loop)
        res[names[stage] + "_ms"] = t * 1e3
        print(f"{names[stage]:18s} {t*1e3:8.3f} ms  (+{(t-prev)*1e3:6.3f})",
              flush=True)
        prev = t

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
