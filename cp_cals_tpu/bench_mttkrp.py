"""MTTKRP method microbenchmark CLI.

Equivalent of the reference's ``benchmark_cals_mttkrp`` binary
(`/root/reference/src/experiments/benchmark_cals_mttkrp.cpp` +
`include/experiments/bench_mttkrp_cals.h`): sweep a rank grid per mode,
time every contraction strategy (min-of-reps), print a table and persist
winners to the lookup tables (utils/lut.py) that the AUTO dispatch consumes
at runtime — the same offline-autotune -> runtime-LUT pipeline as the
reference's `scripts/python/mttkrp/generate_LUTs.py`.

Usage:
  python -m cp_cals_tpu.bench_mttkrp -t 299-301-41 --ranks 4,8,12,16,20 \
      --batch 96
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-t", "--tensor", default="299-301-41")
    p.add_argument("--ranks", default="4,8,16,32")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--batches", default=None,
                   help="comma list of batch sizes (overrides --batch); "
                        "sweep the sizes the engine actually runs, e.g. "
                        "the allocated bucket batch and its tail-compacted "
                        "halves")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from .utils.lut import autotune

    modes = tuple(int(m) for m in args.tensor.split("-"))
    ranks = [int(r) for r in args.ranks.split(",")]
    batches = (
        [int(b) for b in args.batches.split(",")]
        if args.batches
        else [args.batch]
    )
    table = {}
    for b in batches:
        for r in ranks:
            winners = autotune(modes, rank=r, batch=b,
                               dtype=jnp.float32, reps=args.reps)
            table[f"{b}x{r}"] = winners
            print(f"rank {r:4d} batch {b:4d}: {winners}", flush=True)
    print(json.dumps(table))


if __name__ == "__main__":
    main()
