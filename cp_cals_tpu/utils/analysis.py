"""Result-CSV readers and speedup summaries.

Equivalent of the reference's Python analysis helpers
(`/root/reference/scripts/python/experiments/utils.py:7-29`): read the
per-model result CSVs the solvers emit (KTENSOR_ID;RANK;ERROR;ITERS) and
the iteration traces, and compute speedup/efficiency summaries the paper
figures are built from. Plotting is left to the caller (any CSV tool).
"""

from __future__ import annotations

import csv
from dataclasses import dataclass


@dataclass
class ModelRow:
    id: int
    rank: int
    error: float
    iters: int


def read_results_csv(path: str) -> list[ModelRow]:
    out = []
    with open(path, newline="") as f:
        r = csv.DictReader(f, delimiter=";")
        for row in r:
            out.append(
                ModelRow(
                    id=int(row["KTENSOR_ID"]),
                    rank=int(row["RANK"]),
                    error=float(row["ERROR"]),
                    iters=int(row["ITERS"]),
                )
            )
    return out


def read_trace_csv(path: str) -> list[dict]:
    with open(path, newline="") as f:
        return [dict(row) for row in csv.DictReader(f, delimiter=";")]


def summarize(rows: list[ModelRow]) -> dict:
    n = len(rows)
    by_rank: dict[int, list[ModelRow]] = {}
    for r in rows:
        by_rank.setdefault(r.rank, []).append(r)
    return {
        "n_models": n,
        "total_iters": sum(r.iters for r in rows),
        "mean_iters": sum(r.iters for r in rows) / max(n, 1),
        "best_error_by_rank": {
            k: min(r.error for r in v) for k, v in sorted(by_rank.items())
        },
    }


def speedup(time_baseline_s: float, time_s: float) -> float:
    return time_baseline_s / time_s
