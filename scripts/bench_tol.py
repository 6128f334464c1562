"""Tol-driven throughput benchmark: the reference's real-tensor protocol.

The headline bench (bench.py) runs the paper's FORCED-iteration protocol
(50 iterations/model, experiments.cpp:58-98). The reference's real-tensor
experiments are tol-driven (tol 1e-6, <= 1000 iterations,
/root/reference/src/experiments/experiments.cpp:100-150; default tol
include/cals.h:150) — this leg measures models/s under that stopping rule
on the SAME EEM workload, with the mixed-tier scheme
(config.tol_check_interval) keeping the bf16 MTTKRP tier tol-safe.

Two runs, matched at the stopping rule:
  python scripts/bench_tol.py --oracle   # CPU fp64, plain per-iteration stop
  python scripts/bench_tol.py            # TPU fp32, bf16 tier + K=5 checks

The TPU leg reads the oracle file and reports (a) per-model fit deltas,
(b) iteration-count ratios, and (c) vs_baseline where the BASELINE leg
uses the same stopping rule: baseline wall = (sum of ORACLE per-model
iterations x per-iteration FLOPs at true rank) / the measured-and-scaled
32-core CPU rate (bench.py's anchor, baseline/RESULTS.md) — i.e. the
reference machine is credited with the fp64 iteration counts, not ours.

Writes data/benchmarks/bench_tol_{f64,measured}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "benchmarks",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--oracle", action="store_true")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=1000)
    p.add_argument("--tol-check", type=int, default=5)
    p.add_argument("--polish", type=int, default=2)
    p.add_argument("--polish-tol", type=float, default=0.0,
                   help="config.polish_tol: polish converged models TO "
                        "CONVERGENCE at full precision (--polish becomes "
                        "the sweep cap) — drives each model to its "
                        "high-tier fixed point before extraction")
    p.add_argument("--copies", type=int, default=None,
                   help="models per rank (default: 20, the bench workload; "
                        "the oracle may use fewer via --copies)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--mttkrp-tier", default="default",
                   help="MTTKRP precision tier for the TPU leg: 'default' "
                        "(bf16, needs --tol-check > 0), 'high' (bf16_3x, "
                        "f32-equivalent; plain stop works), or '' to "
                        "inherit --precision")
    p.add_argument("--precision", default="high")
    p.add_argument("--evict-batch", type=int, default=1,
                   help="config.evict_batch: defer the host eviction sync "
                        "until this many models have converged (the tol "
                        "protocol's staggered stops are round-trip-bound)")
    args = p.parse_args()

    import jax

    if args.oracle:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        jax.config.update(
            "jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu"
        )
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from bench import BASELINE_CPU_FLOPS
    from cp_cals_tpu.config import CalsParams
    from cp_cals_tpu.ktensor import RandomKtensorSpec, spec_to_ktensor
    from cp_cals_tpu.ops.mttkrp import als_iteration_flops
    from cp_cals_tpu.solvers import cp_cals
    from cp_cals_tpu.solvers.cals import precompile_buckets

    modes = (299, 301, 41)
    copies = args.copies if args.copies is not None else 20
    ranks = range(1, 21)

    rng = np.random.default_rng(42)
    from cp_cals_tpu.ktensor import random_ktensor_host

    kt = random_ktensor_host(rng, modes, 5, dtype=jnp.float32)
    x_np = np.einsum("ir,jr,kr,r->ijk", *kt.factors, kt.lam)
    x_np = x_np + 0.05 * x_np.std() * rng.standard_normal(x_np.shape)

    specs = [
        RandomKtensorSpec(modes, r, seed=1000 * r + c, dtype="float32")
        for r in ranks
        for c in range(copies)
    ]

    if args.oracle:
        # Materialize the f32 inits (bitwise the TPU leg's device-generated
        # ones: jax.random is backend-independent), cast to f64.
        x = jnp.asarray(x_np.astype(np.float64))
        queue = [
            jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                spec_to_ktensor(s),
            )
            for s in specs
        ]
        params = CalsParams(
            tol=args.tol, max_iterations=args.max_iter,
            bucket_ranks=(4, 8, 16, 20), buffer_size=2880,
            sync_mode="evict", tail_compaction_depth=2,
        )
        t0 = time.perf_counter()
        results, rep = cp_cals(x, queue, params)
        wall = time.perf_counter() - t0
        out = {
            "device": str(jax.devices()[0]), "dtype": "float64",
            "tol": args.tol, "max_iter": args.max_iter,
            "copies": copies, "wall_s": round(wall, 3),
            "models": [
                {"id": m.id, "rank": m.rank, "iters": m.iters,
                 "fit": float(m.fit)} for m in rep.models
            ],
        }
        path = os.path.join(OUT_DIR, "bench_tol_f64.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({k: v for k, v in out.items() if k != "models"}))
        return

    # ------------------------------------------------------------- TPU leg
    x = jax.device_put(jnp.asarray(x_np, jnp.float32))
    queue = specs
    params = CalsParams(
        tol=args.tol, max_iterations=args.max_iter,
        # Same grid as bench.py: the rank-12 bucket saves ~12% dead-column
        # compute on this queue (A/B in bench_best_measured.json). The
        # fp64 oracle leg keeps its grid — bucketing is trajectory-
        # invariant (CALS==ALS), so its per-model iters/fits still apply.
        bucket_ranks=(4, 8, 12, 16, 20),
        buffer_size=int(os.environ.get("BENCH_BUFFER", "2880")),
        bucket_threads=int(os.environ.get("BENCH_THREADS", "4")),
        precision=args.precision,
        mttkrp_precision=args.mttkrp_tier or None,
        tol_check_interval=args.tol_check,
        polish_iters=args.polish,
        polish_tol=args.polish_tol,
        evict_batch=args.evict_batch,
        # Half-width result wire (1.40x on the headline bench,
        # data/benchmarks/wire_ab.json); fits/iters are computed on
        # device pre-cast, so every fidelity column below is unaffected.
        result_wire_dtype=os.environ.get("BENCH_WIRE", "float16") or None,
        sync_mode="evict",
        tail_compaction_depth=2,
    )
    precompile_buckets(x, queue, params)
    cp_cals(x, queue, params)  # warm the remaining small programs
    wall = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        results, rep = cp_cals(x, queue, params)
        wall = min(wall, time.perf_counter() - t0)

    n_models = len(queue)
    mean_fit = sum(m.fit for m in rep.models) / n_models
    out = {
        "device": str(jax.devices()[0]), "dtype": "float32",
        "protocol": "tol-driven (reference experiments.cpp:100-150)",
        "tol": args.tol, "max_iter": args.max_iter,
        "tol_check_interval": args.tol_check, "polish_iters": args.polish,
        "polish_tol": args.polish_tol,
        "evict_batch": args.evict_batch,
        "result_wire_dtype": params.result_wire_dtype,
        "mttkrp_precision": args.mttkrp_tier or None,
        "precision": args.precision,
        "copies": copies,
        "wall_s": round(wall, 3),
        "models_per_sec": round(n_models / wall, 1),
        "mean_fit": round(mean_fit, 6),
        "mean_iters": round(sum(m.iters for m in rep.models) / n_models, 2),
        "n_max_iter_capped": sum(
            m.iters >= args.max_iter for m in rep.models
        ),
    }

    oracle_path = os.path.join(OUT_DIR, "bench_tol_f64.json")
    if os.path.exists(oracle_path):
        with open(oracle_path) as f:
            oracle = json.load(f)
        om = {m["id"]: m for m in oracle["models"]}
        deltas, ratios, o_flops = [], [], 0.0
        worst = []
        for m in rep.models:
            o = om.get(m.id)
            if not o:
                continue
            d = abs(m.fit - o["fit"])
            deltas.append(d)
            worst.append(
                {"id": m.id, "rank": m.rank, "fit": float(m.fit),
                 "fit_f64": o["fit"], "iters": m.iters,
                 "iters_f64": o["iters"], "delta": d}
            )
            ratios.append(m.iters / max(o["iters"], 1))
            o_flops += o["iters"] * als_iteration_flops(modes, o["rank"])
        if deltas:
            ds = sorted(deltas)
            out["max_abs_fit_delta_vs_f64"] = max(deltas)
            out["mean_abs_fit_delta_vs_f64"] = sum(deltas) / len(deltas)
            out["median_abs_fit_delta_vs_f64"] = ds[len(ds) // 2]
            out["p99_abs_fit_delta_vs_f64"] = ds[int(len(ds) * 0.99)]
            out["n_delta_gt_1e-2"] = sum(d > 1e-2 for d in deltas)
            out["mean_iters_ratio_vs_f64"] = sum(ratios) / len(ratios)
            out["max_iters_ratio_vs_f64"] = max(ratios)
            out["worst_models"] = sorted(
                worst, key=lambda w: -w["delta"]
            )[:8]
            if len(deltas) == n_models:
                # Baseline leg at the SAME stopping rule: the 32-core
                # reference machine is credited with the fp64 oracle's
                # per-model iteration counts at its measured-and-scaled
                # effective FLOP rate (bench.py anchor).
                base_wall = o_flops / BASELINE_CPU_FLOPS
                out["baseline_wall_s_same_rule"] = round(base_wall, 3)
                out["vs_baseline"] = round(base_wall / wall, 3)
            else:
                out["oracle_coverage"] = f"{len(deltas)}/{n_models}"

    path = os.path.join(OUT_DIR, "bench_tol_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
