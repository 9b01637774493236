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
# the de-saturated full protocol on the SAME trained weights (cache shared
# via the out dir; writes results.json next to dose_response.json)
run dose_proto  14400  python scripts/defense_demo.py --hard \
                         --out docs/defense_dose_hw
run celebahq    14400  bash run_scripts/celebahq/run_celebahq_bpda_glasses.sh
# white-box budget = exactly half the reference protocol (100x10 vs 100x20,
# eval_sde_adv.py:103-110) on an n_eval=16 subset; sde only (round 3 already
# settled dpm equivalence at 20x3); weights reload from the round-3 cache
run flagship_wb 21600  python scripts/defense_demo.py --large \
                         --apgd_iter 100 --eot_iter 10 --n_eval 16 \
                         --out docs/defense_demo_large
# AA standard suite at flagship scale, 100-iter APGD-CE/T + FAB-T,
# Square@300 queries (budget disclosed in DEFENSE.md). Seed the out dir
# with the round-3 trained-weights cache so no retraining happens.
mkdir -p docs/defense_demo_large_aa
[ -f docs/defense_demo_large_aa/trained_weights.pkl ] || \
  ln docs/defense_demo_large/trained_weights.pkl \
     docs/defense_demo_large_aa/trained_weights.pkl 2>/dev/null || true
run flagship_aa 14400  python scripts/defense_demo.py --large --standard \
                         --aa_iter 100 --n_eval 16 \
                         --out docs/defense_demo_large_aa
echo "QUEUE DONE"
