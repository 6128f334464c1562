"""Phase timers and CSV reports.

Equivalent of the reference's three-level timer taxonomy + CSV report
writers (`/root/reference/include/timer.h`, `include/als.h:29-140`,
`include/cals.h:27-133`). On TPU, fine-grained per-kernel wall timing from
the host is meaningless (dispatch is async); instead we keep the same
phase taxonomy with (a) host wall clocks around synced phases, and
(b) analytic FLOP accounting per iteration (the reference also hand-derives
FLOP models, mttkrp.cpp:316-325). Deep kernel-level profiles come from the
JAX profiler (``jax.profiler.trace``), which subsumes the reference's
per-GEMM timers.
"""

from __future__ import annotations

import csv
import time
from collections import defaultdict
from dataclasses import dataclass, field


class Timer:
    """chrono-style accumulating timer (reference timer.h:8-27)."""

    def __init__(self) -> None:
        self.t = 0.0
        self._start = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._start
        self.t += dt
        return dt

    def get_time(self) -> float:
        return self.t


@dataclass
class IterationRecord:
    iteration: int
    active_models: int
    active_columns: int
    flops: int
    wall_s: float
    bucket: int = 0  # bucket rank the record belongs to (threaded traces)


@dataclass
class RunTrace:
    """Per-iteration trace matrix (reference cals.h:55-63 timer matrices)."""

    records: list = field(default_factory=list)
    phase_totals: dict = field(default_factory=lambda: defaultdict(float))

    def add(self, rec: IterationRecord) -> None:
        self.records.append(rec)

    def write_csv(self, path: str) -> None:
        with open(path, "w", newline="") as f:
            w = csv.writer(f, delimiter=";")
            w.writerow(["ITER", "MODELS", "COLS", "FLOPS", "TIME", "BUCKET"])
            for r in self.records:
                w.writerow(
                    [r.iteration, r.active_models, r.active_columns, r.flops,
                     f"{r.wall_s:.9f}", r.bucket]
                )

    @property
    def total_time(self) -> float:
        return sum(r.wall_s for r in self.records)

    @property
    def total_flops(self) -> int:
        return sum(r.flops for r in self.records)


def write_cals_report_csv(path: str, report, params=None) -> None:
    """Full run report with config echo (reference CalsReport::print_header /
    print_to_file, include/cals.h:70-132): a commented header of solver
    parameters followed by per-model rows."""
    with open(path, "w", newline="") as f:
        if params is not None:
            import dataclasses

            for field_ in dataclasses.fields(params):
                v = getattr(params, field_.name)
                v = getattr(v, "value", v)
                f.write(f"# {field_.name}={v}\n")
        f.write(f"# n_ktensors={report.n_ktensors}\n")
        f.write(f"# ktensor_comp_sum={report.ktensor_comp_sum}\n")
        for r, pt in getattr(report, "phase_times", {}).items():
            pretty = ",".join(f"{k}={v:.4f}" for k, v in pt.items())
            f.write(f"# bucket_{r}_times={pretty}\n")
        w = csv.writer(f, delimiter=";")
        w.writerow(["KTENSOR_ID", "RANK", "ERROR", "FIT", "ITERS"])
        for m in report.models:
            w.writerow(
                [m.id, m.rank, f"{m.approx_error:.17g}", f"{m.fit:.17g}",
                 m.iters]
            )


def write_ktensor_results_csv(path: str, model_reports) -> None:
    """id;rank;error;iters per model (reference experiments_utils.cpp:181-187)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(["KTENSOR_ID", "RANK", "ERROR", "ITERS"])
        for m in model_reports:
            w.writerow([m.id, m.rank, f"{m.approx_error:.17g}", m.iters])
