"""CLI demo driver.

Mirrors the reference demo binary (`/root/reference/src/examples/driver.cpp`):
build a random low-rank tensor + a batch of random models across a rank
range, fit them with concurrent CALS, optionally fit the same batch with
sequential/batched ALS, and print the speedup.

Usage:
  python -m cp_cals_tpu.cli -t 100-100-100 -c 1:10:20 [--tol 1e-6]
      [--line-search] [--nnls] [--compare-als] [--jk] [--csv out.csv]
      [--tensor-file path]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "-t", "--tensor", default="100-100-100",
        help="tensor modes, e.g. 299-301-41 (ignored with --tensor-file)",
    )
    p.add_argument(
        "-c", "--components", default="1:10:10",
        help="MIN:MAX:COPIES rank range (reference driver.cpp -c flag)",
    )
    p.add_argument("--rank", type=int, default=5, help="target tensor rank")
    p.add_argument("--noise", type=float, default=0.0)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iterations", type=int, default=200)
    p.add_argument("--buffer-size", type=int, default=4200)
    p.add_argument("--line-search", action="store_true")
    p.add_argument("--nnls", action="store_true")
    p.add_argument("--bucket-threads", type=int, default=4,
                   help="host threads pipelining bucket loops (the analog "
                        "of the reference driver's -n thread knob)")
    p.add_argument("--bucket-ranks", default=None,
                   help="comma list of bucket rank classes, e.g. 4,8,16")
    p.add_argument("--compare-als", action="store_true",
                   help="also run batched ALS and report speedup")
    p.add_argument("--jk", action="store_true",
                   help="jackknife the best model per rank after fitting")
    p.add_argument("--csv", default=None, help="write per-model results CSV")
    p.add_argument("--tensor-file", default=None,
                   help="load target tensor from reference-format text file")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--f64", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="production fast tier: bf16 MTTKRP + mixed-tier "
                        "tol checks (every 5 iterations) + 2 polish sweeps")
    p.add_argument("--evict-batch", type=int, default=1,
                   help="defer the eviction sync until this many models "
                        "have converged (config.evict_batch; big win when "
                        "convergence events scatter, e.g. tol-driven runs "
                        "on high-latency links)")
    p.add_argument("--mode-layouts", default="auto",
                   choices=("auto", "materialized", "recompute"),
                   help="HBM policy for per-mode tensor layouts "
                        "(config.mode_layouts; auto = recompute above "
                        "128 MB)")
    p.add_argument("--epilogue", default="auto",
                   choices=("auto", "fused", "xla"),
                   help="per-mode epilogue (config.epilogue; jackknife "
                        "drivers resolve auto to the accuracy-critical "
                        "fused kernels)")
    p.add_argument("--dimtree", default="auto",
                   choices=("auto", "on", "off"),
                   help="dimension-tree sweep: modes 1/2 share one "
                        "X x_0 A contraction (config.dimtree; auto = on "
                        "for non-bf16 MTTKRP tiers, 3-D only)")
    p.add_argument("--polish-tol", type=float, default=0.0,
                   help="polish converged models to convergence at full "
                        "precision (config.polish_tol; use with --fast)")
    p.add_argument("--wire", default=None, metavar="DTYPE",
                   help="result extraction wire dtype (float16/bfloat16) — "
                        "halves device->host result bytes")
    p.add_argument("--dp", type=int, default=0,
                   help="shard the model batch over this many devices")
    p.add_argument("--tp", type=int, default=1,
                   help="shard tensor mode 0 over this many devices")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "before touching devices (run on every host of a "
                        "pod slice; see scripts/run_pod_slice.sh)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    if args.distributed:
        # Must run before any backend/device initialization so every host
        # joins one coordinated runtime instead of running an independent
        # single-host job.
        from .parallel import distributed

        distributed.initialize()
        print(
            f"host {jax.process_index()}/{jax.process_count()}: "
            f"{jax.local_device_count()} local / {jax.device_count()} chips"
        )

    from .config import AlsParams, CalsParams, UpdateMethod
    from .ktensor import random_ktensor, to_tensor
    from .solvers import cp_batched_als, cp_cals, jk_cp_cals
    from .utils.timers import write_ktensor_results_csv

    dtype = jnp.float64 if args.f64 else jnp.float32
    key = jax.random.PRNGKey(args.seed)
    kx, kn, kk = jax.random.split(key, 3)

    if args.tensor_file:
        from .tensor_io import read_tensor

        x = jnp.asarray(read_tensor(args.tensor_file), dtype)
    else:
        modes = tuple(int(m) for m in args.tensor.split("-"))
        x = to_tensor(random_ktensor(kx, modes, args.rank, dtype=dtype))
        if args.noise:
            x = x + args.noise * jnp.std(x) * jax.random.normal(kn, x.shape, dtype)
    modes = x.shape

    try:
        rmin, rmax, copies = (int(v) for v in args.components.split(":"))
        if rmin < 1 or rmax < rmin or copies < 1:
            raise ValueError
    except ValueError:
        raise SystemExit(
            f"error: -c/--components must be MIN:MAX:COPIES with "
            f"1 <= MIN <= MAX and COPIES >= 1 (got {args.components!r})"
        )
    import numpy as np

    from .ktensor import random_ktensor_host

    rng = np.random.default_rng(args.seed)
    queue = [
        random_ktensor_host(rng, modes, r, dtype=dtype)
        for r in range(rmin, rmax + 1)
        for _ in range(copies)
    ]

    update = UpdateMethod.NNLS if args.nnls else UpdateMethod.UNCONSTRAINED
    extra = {}
    if args.bucket_ranks:
        extra["bucket_ranks"] = tuple(
            int(r) for r in args.bucket_ranks.split(",")
        )
    if args.fast and not args.f64:
        extra.update(
            mttkrp_precision="default", tol_check_interval=5, polish_iters=2
        )
    if args.wire:
        extra["result_wire_dtype"] = args.wire
    if args.polish_tol > 0:
        # Must OVERRIDE --fast's polish_iters=2: with polish-to-
        # convergence, polish_iters is the sweep CAP, and a cap of 2
        # would silently revert to the fixed-sweep tier.
        extra["polish_tol"] = args.polish_tol
        extra["polish_iters"] = 25
    cals_params = CalsParams(
        tol=args.tol,
        max_iterations=args.max_iterations,
        buffer_size=args.buffer_size,
        line_search=args.line_search,
        update_method=update,
        bucket_threads=args.bucket_threads,
        evict_batch=args.evict_batch,
        mode_layouts=args.mode_layouts,
        dimtree=args.dimtree,
        epilogue=args.epilogue,
        **extra,
    )
    print(f"Tensor {modes}, {len(queue)} models, ranks {rmin}..{rmax}")
    print(f"Device: {jax.devices()[0]}")

    mesh = None
    if args.dp or args.tp > 1:
        from .parallel.sharding import make_mesh

        n_dp = args.dp or (len(jax.devices()) // args.tp)
        mesh = make_mesh(n_dp=n_dp, n_tp=args.tp)
        print(f"Mesh: dp={n_dp} x tp={args.tp}")

    t0 = time.perf_counter()
    results, rep = cp_cals(
        x, queue, cals_params, mesh=mesh, shard_mode0=args.tp > 1
    )
    cals_s = time.perf_counter() - t0
    mean_fit = sum(m.fit for m in rep.models) / len(rep.models)
    print(
        f"CALS: {cals_s:.3f}s, {len(queue) / cals_s:.2f} models/s, "
        f"mean fit {mean_fit:.6f}, "
        f"mean iters {sum(m.iters for m in rep.models) / len(rep.models):.1f}"
    )

    if args.csv:
        write_ktensor_results_csv(args.csv, rep.models)
        print(f"wrote {args.csv}")

    if args.compare_als:
        als_params = AlsParams(
            tol=args.tol,
            max_iterations=args.max_iterations,
            line_search=args.line_search,
            update_method=update,
        )
        # Group by rank for the batched-ALS comparator (one program per rank).
        t0 = time.perf_counter()
        by_rank: dict[int, list] = {}
        for kt in queue:
            by_rank.setdefault(kt.rank, []).append(kt)
        for r, kts in by_rank.items():
            cp_batched_als(x, kts, als_params)
        als_s = time.perf_counter() - t0
        print(f"Batched ALS: {als_s:.3f}s -> CALS speedup {als_s / cals_s:.2f}x")

    if args.jk:
        best = {}
        for m, kt in zip(rep.models, results):
            if m.rank not in best or m.approx_error < best[m.rank][0].approx_error:
                best[m.rank] = (m, kt)
        models = [kt for _, kt in best.values()]
        t0 = time.perf_counter()
        jk_rep = jk_cp_cals(x, models, cals_params)
        jk_s = time.perf_counter() - t0
        n_reps = sum(len(r) for r in jk_rep.results)
        print(f"Jackknife: {n_reps} replicates in {jk_s:.3f}s")


if __name__ == "__main__":
    main()
