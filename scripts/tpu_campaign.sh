#!/bin/bash
# Unattended TPU measurement campaign. Run when the tunnel is healthy:
#   nohup bash scripts/tpu_campaign.sh > /tmp/campaign.log 2>&1 &
#
# Stages run strictly one at a time (two TPU processes serialize on the
# device) with per-stage timeouts; a failed/hung stage is killed and the
# campaign moves on. Outputs land in data/benchmarks/r2_campaign/.
set -u
cd "$(dirname "$0")/.."
OUT=data/benchmarks/r2_campaign
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

stage() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date +%H:%M:%S) ==="
  tail -3 "$OUT/$name.log"
}

# 0. Health gate: bail early if the tunnel is down.
if ! timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('health OK', float(jnp.sum((x@x).astype(jnp.float32))))"; then
  echo "TUNNEL DOWN - aborting campaign"; exit 1
fi

# 1. Headline bench, twice (no cross-process compile cache on this
#    backend: both runs are cold; report both, best is the headline).
stage bench_1 3600 python bench.py
stage bench_2 3600 python bench.py

# 2. LUT refresh over the (batch, rank) programs the bench engine
#    actually allocates (waves: r4/r8/r20 at B=96, r16 at B=160; the
#    runtime reuses base-batch methods after tail compaction, so
#    compacted widths need no entries).
stage lut_refresh_b96 3600 python -m cp_cals_tpu.bench_mttkrp \
  -t 299-301-41 --ranks 4,8,20 --batches 96 --reps 5
stage lut_refresh_b160 2400 python -m cp_cals_tpu.bench_mttkrp \
  -t 299-301-41 --ranks 16 --batches 160 --reps 5

# 3. Pallas fused kernel vs XLA twostep, interleaved A/B (shared-chip
#    noise discipline), at the two widest bench programs.
stage pallas_ab_r16 2400 python scripts/bench_pallas_ab.py 16 96 7
stage pallas_ab_r20 2400 python scripts/bench_pallas_ab.py 20 96 7

# 4. Post-fusion iteration profile: decompose the compiled iteration at
#    the widest bench program (the ~50/50 MTTKRP/small-ops split and the
#    unexplained iteration-vs-sum-of-parts gap were measured pre-fusion).
#    Writes over the committed profile (the old one lives in git history)
#    so the figures stage picks it up.
stage profile_iter 2400 python scripts/profile_iteration.py \
  --batch 96 --rank 20 --components \
  --out data/benchmarks/profile_r20_b96.json

# 5. Tol-driven convergence fidelity on hardware (fit vs fp64 oracle).
stage convergence 3600 python scripts/convergence_run.py

# 5b. External MTTKRP comparison on CPU (torch/NumPy; doesn't touch the
#     TPU, but keep it serialized for clean CPU timings).
stage external_mttkrp 2400 python scripts/bench_mttkrp_external.py \
  --out data/benchmarks/external_mttkrp.json

# 5c. LUT coverage for the experiment-grid + JK-paper shapes (the
#     reference ships tables for 11 shapes; EEM alone is not enough).
stage lut_shapes 7200 bash -c 'for t in 100-100-100 300-300-300 \
  50-100-100 50-200-200 405-136-19; do
  python -m cp_cals_tpu.bench_mttkrp -t $t --ranks 4,8,16,20 \
    --batches 96 --reps 4; done'

# 6. Experiment pack at the reference's full grid (100/200/300^3 + defrag
#    + JK paper workloads). Longest stage; runs last so earlier stages
#    still land if the tunnel dies mid-campaign.
#    Results land in the committed data/benchmarks/ (what the figures
#    stage and the repo's analysis read); stage logs stay in $OUT.
stage experiments_large 14400 python -m cp_cals_tpu.experiments \
  --large --defrag --jk --jk-scale --out data/benchmarks

# 6b. BASELINE config-5 single-host leg: 5000 concurrent CPDs on 500^3.
stage scale_sweep 7200 python -m cp_cals_tpu.experiments \
  --scale-sweep --no-base --out data/benchmarks

# 7. Re-render the committed figures from whatever results landed.
stage figures 600 python scripts/plot_experiments.py

echo "CAMPAIGN DONE $(date +%H:%M:%S)"
