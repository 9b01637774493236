#!/usr/bin/env bash
# Round-4 hardware queue: every chip-blocked item from VERDICT.md, in
# priority order, each logged + bounded. Fire this the moment the axon
# backend is reachable again; items are independent (failures don't stop
# the queue).
#
#   bash scripts/hw_queue.sh [logdir]
#
# 1. bench.py                     - audits all workloads incl. the new
#                                   imagenet256 grad + ddim50 rows; its tail
#                                   verifies the halo-DMA rework killed the
#                                   AsyncCopyDescriptor ERROR spam (VERDICT W1)
# 2. imagenet_grad_probe          - the ImageNet-256 white-box gradient path
#                                   end-to-end on chip (VERDICT M1)
# 3. perf_residual                - GN-serialization vs MXU-efficiency split
#                                   of the CIFAR residual (VERDICT W3)
# 4. defense_demo --hard --sweep  - trained-weights dose-response t* curve
#                                   in the de-saturated regime (VERDICT M2)
# 5. defense_demo --large         - flagship rerun at >=half-reference attack
#                                   budgets + AA standard suite (VERDICT W2)
# 6. celebahq BPDA t*=500         - the full-length CelebA protocol once on
#                                   hardware, halo-fused DDPM-256 (VERDICT #7)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue}
mkdir -p "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc after $((SECONDS - t0))s (log $LOG/$name.log) ==="
}

run bench        7200  python bench.py
run inet_grad   10800  python scripts/imagenet_grad_probe.py \
                         --phases fwd,bwd,grad,apgd --batch 2
run residual     3600  python scripts/perf_residual.py
run dose        14400  python scripts/defense_demo.py --hard \
                         --sweep 0,5,25,100 --out docs/defense_dose_hw
run flagship    21600  python scripts/defense_demo.py --large --standard \
                         --apgd_iter 100 --eot_iter 10 \
                         --out docs/defense_demo_large
run celebahq    14400  bash run_scripts/celebahq/run_celebahq_bpda_glasses.sh
echo "QUEUE DONE"
