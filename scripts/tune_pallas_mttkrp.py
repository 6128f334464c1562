"""Tune the fused Pallas MTTKRP kernel's tiling against the XLA twostep.

Round-3 finding (data/benchmarks/ablation.json): the iteration is ~95%
MTTKRP, and the XLA twostep is bound by its [I_n*I_small, B*R] HBM
intermediate (~94 MB written + read per mode). The fused kernel avoids that
round-trip but its default lane-block (db = lcm(R,128)/R models) re-reads
the tensor bpr/dbr times. This sweep measures db (lane-block width), cj
(small-mode unroll) and precision per mode, interleaved with the XLA
twostep baseline.

Usage: python scripts/tune_pallas_mttkrp.py [--rank 20] [--batch 96]
           [--precisions high,default] [--out data/benchmarks/pallas_tune.json]
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N_LOOP = 100
NULL = [0.0]


def make_fn(x, factors, mode, call):
    other = [m for m in range(3) if m != mode][0]

    def run_fn(x, f):
        def body(i, f):
            g = call(x, f)
            fo = f[other] + jnp.sum(g, axis=-2, keepdims=True) * 1e-20
            return f[:other] + (fo,) + f[other + 1 :]

        out = jax.lax.fori_loop(0, N_LOOP, body, f)
        return jnp.sum(out[other][..., 0, :]) * 1e-20

    return jax.jit(run_fn)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="299-301-41")
    p.add_argument("--rank", type=int, default=20)
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--precisions", default="high,default")
    p.add_argument("--dbs", default="")
    p.add_argument("--cjs", default="8")
    p.add_argument("--out", default="data/benchmarks/pallas_tune.json")
    args = p.parse_args()

    from cp_cals_tpu.ops.mttkrp import mttkrp_batched, prepare_batched
    from cp_cals_tpu.ops.pallas_mttkrp import (
        _pick_db,
        mttkrp_batched_pallas,
        prepare_mode_tensor,
    )

    modes = tuple(int(m) for m in args.modes.split("-"))
    r, b = args.rank, args.batch
    # Null dispatch+scalar-fetch round-trip: subtracted from every wall
    # (docs/PROFILE.md rule 4 — at N_LOOP=20 forgetting this adds ~1.4 ms
    # to every per-call number, swamping the real ~0.3 ms kernels).
    @jax.jit
    def _null(a):
        return jnp.sum(a) * 1e-30

    z = jnp.zeros((8, 128), jnp.float32)
    float(np.asarray(_null(z)))
    lat = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(_null(z)))
        lat = min(lat, time.perf_counter() - t0)
    NULL[0] = lat
    print(f"null round-trip {lat*1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], modes, jnp.float32)
    factors = tuple(
        jax.random.normal(k, (b, m, r), jnp.float32)
        for k, m in zip(ks[1:], modes)
    )
    flops = 2 * int(np.prod(modes)) * b * r
    default_db = _pick_db(r)
    dbs = (
        [int(d) for d in args.dbs.split(",") if d]
        or sorted({default_db, b})
    )
    cjs = [int(c) for c in args.cjs.split(",") if c]
    precs = args.precisions.split(",")
    print(f"device {jax.devices()[0]} modes {modes} R={r} B={b} "
          f"dbs={dbs} cjs={cjs} precs={precs}", flush=True)

    results = {"modes": modes, "rank": r, "batch": b, "cases": []}
    for mode in range(3):
        cases = {}
        prep_ts = prepare_batched(x, ("twostep",) * 3)[mode]
        for prec in precs:
            xprec = {
                "high": jax.lax.Precision.HIGH,
                "highest": jax.lax.Precision.HIGHEST,
                "default": jax.lax.Precision.DEFAULT,
            }[prec]
            cases[f"twostep/{prec}"] = make_fn(
                x, factors, mode,
                lambda x, f, xp=xprec: mttkrp_batched(
                    x, f, mode, "twostep", xp, prep_ts
                ),
            )
        for db, cj, prec in itertools.product(dbs, cjs, precs):
            if b % db:
                continue
            prep = prepare_mode_tensor(x, mode, cj=cj)
            cases[f"pallas/db{db}/cj{cj}/{prec}"] = make_fn(
                x, factors, mode,
                lambda x, f, pp=prep, d=db, c=cj, pr=prec: (
                    mttkrp_batched_pallas(
                        x, f, mode, prepared=pp, precision=pr, db=d, cj=c
                    )
                ),
            )
        # compile everything first
        compiled = {}
        for name, fn in cases.items():
            try:
                float(np.asarray(fn(x, factors)))
                compiled[name] = fn
            except Exception as e:  # noqa: BLE001 — record OOM/lowering fails
                print(f"mode={mode} {name}: FAILED {type(e).__name__}",
                      flush=True)
                results["cases"].append(
                    {"mode": mode, "name": name, "error": str(e)[:200]}
                )
        best = {k: float("inf") for k in compiled}
        for _ in range(args.reps):
            for name, fn in compiled.items():
                t0 = time.perf_counter()
                float(np.asarray(fn(x, factors)))
                dt = max(time.perf_counter() - t0 - NULL[0], 1e-9)
                best[name] = min(best[name], dt / N_LOOP)
        for name, t in sorted(best.items(), key=lambda kv: kv[1]):
            print(f"mode={mode} {name:28s} {t*1e3:7.3f} ms "
                  f"{flops/t/1e12:6.1f} TF/s", flush=True)
            results["cases"].append(
                {"mode": mode, "name": name, "ms": t * 1e3,
                 "tflops": flops / t / 1e12}
            )
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
