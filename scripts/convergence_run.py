"""Tol-driven convergence fidelity: TPU fp32 (+df64 error) vs CPU fp64.

VERDICT r1 #6 / SURVEY §7 "fp32 convergence floor": demonstrate that a
tolerance-driven (NOT force_max_iter) run on TPU hardware reaches fits
matched to the fp64 oracle. The compensated double-float error reduction
(ops/error.py) removes the catastrophic cancellation in the FastALS error;
the residual fit delta is set by the f32 MTTKRP/gramian kernels' rounding.

Protocol: EEM-shaped low-rank+5%-noise tensor, models of ranks {3,5,7} x 2
copies from shared host-side inits, tol 1e-6, max 500 iterations.

Run the CPU fp64 oracle first, then the TPU run (reads the oracle file):
  python scripts/convergence_run.py --oracle     # CPU, fp64
  python scripts/convergence_run.py              # TPU, fp32, emits deltas
Writes data/benchmarks/convergence_{f64,tpu}.json.
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
    p.add_argument("--oracle", action="store_true",
                   help="run the CPU fp64 oracle instead of the TPU run")
    p.add_argument("--modes", default="299-301-41")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=500)
    p.add_argument("--precision", default="highest")
    p.add_argument("--mttkrp-precision", default=None,
                   help="MTTKRP-only precision tier override")
    p.add_argument("--polish", type=int, default=0,
                   help="polish_iters: full-precision refinement sweeps for "
                        "converged models (the bench's production knob)")
    p.add_argument("--tol-check", type=int, default=0,
                   help="tol_check_interval: mixed-tier stopping — evaluate "
                        "the stop every K iterations from a full-precision "
                        "last-mode MTTKRP (makes the bf16 tier tol-safe)")
    p.add_argument("--tag", default=None,
                   help="output suffix (default: f64 oracle / tpu)")
    args = p.parse_args()

    import jax

    if args.oracle:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from cp_cals_tpu.config import CalsParams
    from cp_cals_tpu.ktensor import random_ktensor_host
    from cp_cals_tpu.solvers import cp_cals

    modes = tuple(int(m) for m in args.modes.split("-"))
    dtype = jnp.float64 if args.oracle else jnp.float32

    # Shared host-side f64 workload; each run casts to its own dtype.
    rng = np.random.default_rng(7)
    kt_true = random_ktensor_host(rng, modes, 5, dtype=jnp.float64)
    x64 = np.einsum(
        "ir,jr,kr,r->ijk",
        *[np.asarray(f) for f in kt_true.factors],
        np.asarray(kt_true.lam),
    )
    x64 = x64 + 0.05 * x64.std() * rng.standard_normal(x64.shape)
    x = jnp.asarray(x64.astype(np.dtype(str(jnp.dtype(dtype)))))

    ranks = [3, 3, 5, 5, 7, 7]
    queue64 = [
        random_ktensor_host(rng, modes, r, dtype=jnp.float64) for r in ranks
    ]
    queue = [
        jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype), kt)
        for kt in queue64
    ]

    params = CalsParams(
        tol=args.tol,
        max_iterations=args.max_iter,
        bucket_ranks=(4, 8),
        precision=args.precision,
        mttkrp_precision=args.mttkrp_precision,
        polish_iters=args.polish,
        tol_check_interval=args.tol_check,
        sync_mode="evict",
    )

    cp_cals(x, queue, params)  # warm (compile)
    t0 = time.perf_counter()
    results, rep = cp_cals(x, queue, params)
    wall = time.perf_counter() - t0

    tag = args.tag or ("f64" if args.oracle else "tpu")
    out = {
        "device": str(jax.devices()[0]),
        "dtype": str(jnp.dtype(dtype)),
        "precision": args.precision,
        "mttkrp_precision": args.mttkrp_precision,
        "polish_iters": args.polish,
        "tol_check_interval": args.tol_check,
        "tol": args.tol,
        "wall_s": round(wall, 3),
        "models": [
            {"id": m.id, "rank": m.rank, "iters": m.iters,
             "fit": float(m.fit), "error": float(m.approx_error)}
            for m in rep.models
        ],
    }

    os.makedirs(OUT_DIR, exist_ok=True)
    if not args.oracle:
        oracle_path = os.path.join(OUT_DIR, "convergence_f64.json")
        if os.path.exists(oracle_path):
            with open(oracle_path) as f:
                oracle = json.load(f)
            om = {m["id"]: m for m in oracle["models"]}
            deltas, ratios = [], []
            for m in out["models"]:
                o = om.get(m["id"])
                if o:
                    m["fit_delta_vs_f64"] = m["fit"] - o["fit"]
                    m["iters_f64"] = o["iters"]
                    deltas.append(abs(m["fit_delta_vs_f64"]))
                    ratios.append(m["iters"] / max(o["iters"], 1))
            out["max_abs_fit_delta"] = max(deltas) if deltas else None
            out["mean_abs_fit_delta"] = (
                sum(deltas) / len(deltas) if deltas else None
            )
            out["max_iters_ratio_vs_f64"] = max(ratios) if ratios else None
            out["mean_iters_ratio_vs_f64"] = (
                sum(ratios) / len(ratios) if ratios else None
            )
    with open(os.path.join(OUT_DIR, f"convergence_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "models"}))
    for m in out["models"]:
        print(m)


if __name__ == "__main__":
    main()
