#!/usr/bin/env bash
# Round-4 continuation queue (c): items after flagship_wb, reprioritized —
# the flagship AA-standard suite reuses flagship_wb's trained-weights cache
# (no retraining), so it is cheap and closes the second half of VERDICT W2
# (APGD-T/FAB-T/Square at flagship scale) before the longer dose/celebahq
# items.
#
#   bash scripts/hw_queue_r4c.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r4c}
mkdir -p "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc after $((SECONDS - t0))s (log $LOG/$name.log) ==="
}

# 1. AA standard suite (APGD-CE/T + FAB-T + Square) at flagship scale,
#    100-iter budgets, seeded with flagship_wb's trained weights
mkdir -p docs/defense_demo_large_aa
[ -f docs/defense_demo_large_aa/trained_weights.pkl ] || \
  cp docs/defense_demo_large/trained_weights.pkl \
     docs/defense_demo_large_aa/trained_weights.pkl 2>/dev/null || true
run flagship_aa  9600  python scripts/defense_demo.py --large --standard \
                         --aa_iter 100 --n_eval 16 \
                         --out docs/defense_demo_large_aa

# 2. fixed residual harness (two-grid-delta microbench + chained part1)
run residual2    2700  python scripts/perf_residual.py

# 3. trained-weights dose-response in the de-saturated regime (VERDICT M2)
run dose_hw      5400  python scripts/defense_demo.py --hard \
                         --sweep 0,5,25,100 --out docs/defense_dose_hw

# 4. de-saturated full protocol, same trained weights (cache shared)
run dose_proto   5400  python scripts/defense_demo.py --hard \
                         --out docs/defense_dose_hw

# 5. full-length CelebA t*=500 BPDA (VERDICT #7)
run celebahq    10800  bash run_scripts/celebahq/run_celebahq_bpda_glasses.sh

echo "QUEUE DONE"
