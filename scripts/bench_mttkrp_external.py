"""External MTTKRP comparison benchmark.

Analog of the reference's ``benchmark_other_mttkrp`` binary, which pits its
MTTKRP against two independent external implementations — CTF (MPI
Einstein-notation) and PLANC (dimension trees) — on the same shapes
(`/root/reference/src/experiments/benchmark_other_mttkrp.cpp`,
`include/experiments/bench_mttkrp_ctf.h:23-69`, `bench_mttkrp_planc.h:25-98`).

Neither CTF nor PLANC exists in this environment (external MPI builds), so
the independent implementations here are the two mature CPU tensor stacks
that ARE available, plus a fresh native one:

* **cpp-omp** — an independent C++/OpenMP MTTKRP written from the
  definition (``cp_cals_tpu/native/mttkrp_ref.cpp``): per-mode fused
  loops, thread-private accumulation, the PLANC-style shared-memory
  contender (3-D tensors);

* **torch** — MTTKRP via ``torch.einsum`` (its own contraction planner,
  ATen/MKL-backed, multithreaded), in both the KRP-materializing and the
  two-step (TTM+TTV) formulations;
* **numpy** — ``np.einsum(optimize='optimal')``, BLAS-backed via tensordot
  for the twostep form.

All contenders run on CPU (set JAX_PLATFORMS=cpu before importing jax) so
the comparison is same-hardware, like the reference's single-node CTF/PLANC
runs. Each result is cross-checked elementwise against NumPy — the benchmark
doubles as an external correctness oracle for the kernel formulations.

Usage:
  JAX_PLATFORMS=cpu python scripts/bench_mttkrp_external.py \
      [--tensors 100-100-100,299-301-41] [--ranks 5,20,100] [--reps 3] \
      [--out data/benchmarks/external_mttkrp.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, reps):
    """Min-of-reps wall time (the reference's bench_utils.h min-of-3)."""
    best = float("inf")
    for _ in range(reps + 1):  # +1 warmup rep, not counted
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best, out


# --- NumPy contenders (also the correctness oracle) -----------------------


def np_mttkrp_krp(x, factors, mode):
    others = [m for m in range(x.ndim) if m != mode]
    krp = factors[others[0]]
    for m in others[1:]:
        krp = (krp[:, None, :] * factors[m][None, :, :]).reshape(
            -1, krp.shape[-1]
        )
    xu = np.transpose(x, (mode, *others)).reshape(x.shape[mode], -1)
    return xu @ krp


def np_mttkrp_twostep(x, factors, mode):
    others = [m for m in range(x.ndim) if m != mode]
    order = sorted(others, key=lambda m: -x.shape[m])
    t = np.tensordot(x, factors[order[0]], axes=([order[0]], [0]))
    live = [m for m in range(x.ndim) if m != order[0]]
    for m in order[1:]:
        ax = live.index(m)
        t = np.einsum(
            t, list(range(t.ndim)),
            factors[m], [ax, t.ndim - 1],
            [i for i in range(t.ndim) if i != ax],
        )
        live.pop(ax)
    return t


# --- torch contenders ------------------------------------------------------


def torch_mttkrp_krp(x, factors, mode):
    import torch

    others = [m for m in range(x.ndim) if m != mode]
    krp = factors[others[0]]
    for m in others[1:]:
        krp = (krp[:, None, :] * factors[m][None, :, :]).reshape(
            -1, krp.shape[-1]
        )
    xu = x.permute(mode, *others).reshape(x.shape[mode], -1)
    return xu @ krp


def torch_mttkrp_twostep(x, factors, mode):
    import torch

    others = [m for m in range(x.ndim) if m != mode]
    order = sorted(others, key=lambda m: -x.shape[m])
    t = torch.tensordot(x, factors[order[0]], dims=([order[0]], [0]))
    live = [m for m in range(x.ndim) if m != order[0]]
    for m in order[1:]:
        ax = live.index(m)
        letters = "abcdefghij"
        in1 = letters[: t.ndim]
        in2 = letters[ax] + letters[t.ndim - 1]
        out = "".join(c for i, c in enumerate(in1) if i != ax)
        t = torch.einsum(f"{in1},{in2}->{out}", t, factors[m])
        live.pop(ax)
    return t


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tensors", default="100-100-100,299-301-41")
    p.add_argument("--ranks", default="5,20,100")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    # Same-hardware comparison: force the CPU backend (the session env pins
    # jax to the remote TPU plugin; the env var alone doesn't stick).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # fp64 like the reference
    import jax.numpy as jnp
    import torch

    assert jax.devices()[0].platform == "cpu", jax.devices()

    from cp_cals_tpu.ops.mttkrp import mttkrp, mttkrp_flops

    try:
        from cp_cals_tpu.native.mttkrp_native import mttkrp3 as cpp_mttkrp3
    except Exception:  # toolchain unavailable: skip the native contender
        cpp_mttkrp3 = None

    torch.set_num_threads(os.cpu_count() or 1)
    rng = np.random.default_rng(0)
    results = []
    header = (
        f"{'tensor':>14} {'rank':>5} {'mode':>4} "
        f"{'ours-krp':>9} {'ours-ts':>9} {'torch-krp':>10} "
        f"{'torch-ts':>9} {'np-krp':>9} {'np-ts':>9} {'cpp-omp':>9}"
        f"  (GFLOP/s)"
    )
    print(header, flush=True)
    for tstr in args.tensors.split(","):
        modes = tuple(int(m) for m in tstr.split("-"))
        x_np = rng.standard_normal(modes).astype(np.float64)
        x_j = jnp.asarray(x_np)
        x_t = torch.from_numpy(x_np)
        for r in (int(s) for s in args.ranks.split(",")):
            f_np = [
                rng.standard_normal((m, r)).astype(np.float64) for m in modes
            ]
            f_j = [jnp.asarray(f) for f in f_np]
            f_t = [torch.from_numpy(f) for f in f_np]
            for mode in range(len(modes)):
                flops = mttkrp_flops(modes, r, mode)
                ours_krp = jax.jit(
                    lambda x, f: mttkrp(x, f, mode, "krp_gemm")
                )
                ours_ts = jax.jit(lambda x, f: mttkrp(x, f, mode, "twostep"))
                oracle = np_mttkrp_krp(x_np, f_np, mode)

                row = {"tensor": tstr, "rank": r, "mode": mode,
                       "flops": flops}
                contenders = {
                    "ours_krp": lambda: np.asarray(ours_krp(x_j, f_j)),
                    "ours_twostep": lambda: np.asarray(ours_ts(x_j, f_j)),
                    "torch_krp": lambda: torch_mttkrp_krp(
                        x_t, f_t, mode).numpy(),
                    "torch_twostep": lambda: torch_mttkrp_twostep(
                        x_t, f_t, mode).numpy(),
                    "np_krp": lambda: np_mttkrp_krp(x_np, f_np, mode),
                    "np_twostep": lambda: np_mttkrp_twostep(
                        x_np, f_np, mode),
                }
                # Independent native implementation (C++/OpenMP fused
                # loops, native/mttkrp_ref.cpp) — the PLANC-style
                # shared-memory contender; 3-D only.
                if cpp_mttkrp3 is not None and len(modes) == 3:
                    contenders["cpp_omp"] = lambda: cpp_mttkrp3(
                        x_np, f_np, mode)
                for name, fn in contenders.items():
                    dt, out = timeit(fn, args.reps)
                    rel = float(
                        np.max(np.abs(out - oracle))
                        / max(np.max(np.abs(oracle)), 1e-30)
                    )
                    if rel > 1e-10:
                        raise AssertionError(
                            f"{name} disagrees with oracle: {rel:g} "
                            f"({tstr} rank {r} mode {mode})"
                        )
                    row[name + "_s"] = dt
                    row[name + "_gflops"] = flops / dt / 1e9
                results.append(row)
                print(
                    f"{tstr:>14} {r:>5} {mode:>4} "
                    + " ".join(
                        f"{row[k + '_gflops']:>9.1f}"
                        for k in (
                            "ours_krp", "ours_twostep", "torch_krp",
                            "torch_twostep", "np_krp", "np_twostep",
                        )
                    )
                    + (
                        f" {row['cpp_omp_gflops']:>9.1f}"
                        if "cpp_omp_gflops" in row
                        else ""
                    ),
                    flush=True,
                )

    if args.out:
        summary = {
            "note": (
                "External MTTKRP comparison on CPU (analog of the "
                "reference's CTF/PLANC benchmark_other_mttkrp; torch, "
                "numpy, and an independent C++/OpenMP implementation "
                "(native/mttkrp_ref.cpp, PLANC-style shared-memory "
                "contender) stand in for the external stacks). fp64; min "
                f"of {args.reps} reps; every contender verified against "
                "the NumPy oracle at 1e-10."
            ),
            "cpus": os.cpu_count(),
            "rows": results,
        }
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
