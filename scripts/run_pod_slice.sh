#!/usr/bin/env bash
# Multi-host launch for a TPU pod slice — the analog of the reference's
# single-node SLURM scripts (/root/reference/scripts/slurm/*.sl), which had
# no multi-node story. Run this on every host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`).
#
# Env: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID are set by
# the TPU runtime on Cloud TPU VMs automatically (jax.distributed.initialize
# picks them up); override here for manual clusters.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

: "${WORKLOAD:=-t 299-301-41 -c 1:20:20}"

# --distributed makes the workload process itself call
# jax.distributed.initialize() before touching devices, so every host joins
# ONE coordinated run (a separate init in a throwaway interpreter would
# leave the actual job uncoordinated).
python -m cp_cals_tpu.cli --distributed ${WORKLOAD}
