"""Hardware peaks + MFU accounting for the bench output.

The reference calibrates a "speed of light" per machine (measured DGEMM
efficiency tables, `/root/reference/scripts/python/utils/system_config.py:19-41`,
and the peak_evaluator binary). Here the hardware peak comes from the chip
spec table below (plus an optional measured-peak probe), and the bench
reports fraction-of-peak at two levels:

* ``mfu``       — useful-FLOPs / hardware bf16 peak (the standard "model
                  FLOPs utilization": counts each algorithmic FLOP once).
* ``mxu_util``  — executed-MXU-FLOPs / peak, where fp32-via-bf16 passes
                  multiply executed FLOPs (precision "high" = bf16_3x
                  runs ~3 MXU passes per algorithmic FLOP).
"""

from __future__ import annotations

import jax

# Per-chip dense peak matmul throughput, TFLOP/s.
# Sources: public TPU spec sheets (v5e: 197 bf16 / 394 int8; v4: 275 bf16;
# v5p: 459 bf16; v6e "Trillium": 918 bf16).
PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
    "TPU v5": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}

# MXU passes per algorithmic FLOP for f32-input matmuls at each JAX
# precision (bf16_6x is what XLA:TPU uses for HIGHEST on f32 inputs).
PASSES = {"default": 1, "high": 3, "highest": 6}


def device_peak_bf16_tflops(device=None) -> float | None:
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "")
    for prefix, peak in PEAK_BF16_TFLOPS.items():
        if kind.startswith(prefix):
            return peak
    return None


def mfu(achieved_tflops: float, device=None) -> float | None:
    """Useful-FLOP fraction of the chip's bf16 peak."""
    peak = device_peak_bf16_tflops(device)
    return None if peak is None else achieved_tflops / peak


def mxu_utilization(
    achieved_tflops: float, precision: str = "high", device=None
) -> float | None:
    """Fraction of peak counting the multiple MXU passes fp32-precision
    matmuls execute per algorithmic FLOP."""
    peak = device_peak_bf16_tflops(device)
    if peak is None:
        return None
    return achieved_tflops * PASSES.get(precision, 1) / peak
