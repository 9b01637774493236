#!/usr/bin/env bash
# Round-4 continuation queue: the chip-blocked items hw_queue.sh did not
# reach before the backend window closed (bench + imagenet_grad_probe ran;
# this picks up from there). Same contract: each item independent, logged,
# bounded.
#
#   bash scripts/hw_queue_r4b.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r4b}
mkdir -p "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc after $((SECONDS - t0))s (log $LOG/$name.log) ==="
}

# 1. GN-vs-MXU residual split (VERDICT W3) — short, unblocks PERF.md
run residual     2700  python scripts/perf_residual.py

# 2. flagship white-box at half-reference budgets (VERDICT W2):
#    APGD 100 iters x EOT 10 (ref: 100 x 20) on n_eval=16, sde only
run flagship_wb  9600  python scripts/defense_demo.py --large \
                         --apgd_iter 100 --eot_iter 10 --n_eval 16 \
                         --out docs/defense_demo_large

# 3. trained-weights dose-response in the de-saturated regime (VERDICT M2)
run dose_hw      5400  python scripts/defense_demo.py --hard \
                         --sweep 0,5,25,100 --out docs/defense_dose_hw

# 4. de-saturated full protocol, same trained weights (cache shared)
run dose_proto   5400  python scripts/defense_demo.py --hard \
                         --out docs/defense_dose_hw

# 5. full-length CelebA t*=500 BPDA (VERDICT #7)
run celebahq    10800  bash run_scripts/celebahq/run_celebahq_bpda_glasses.sh

echo "QUEUE DONE"
