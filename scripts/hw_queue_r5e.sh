#!/usr/bin/env bash
# Round-5 hardware queue, leg E — post-r5d items.
# Waits for leg D to release the chip, then:
#   1. CelebA-HQ BPDA legs (probe + t*=500): leg D's attempts crashed in
#      data loading — the reference's 2% val-fraction slice rounds to
#      zero images on the 24-image fixture (fixed: celebahq_subset
#      min_count floor, data/datasets.py).
#   2. mm9/mm1 MXU microbench re-run: the r5b chip run predates the
#      loop-hoisting fix (109aa85), so docs/perf_residual.json still
#      carries the invalid->withheld error for part2.
#
#   setsid nohup bash scripts/hw_queue_r5e.sh >/tmp/hw_queue_r5e.log 2>&1 \
#     </dev/null & echo $! >/tmp/hw_queue_r5e.pid
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5e}
mkdir -p "$LOG"

while kill -0 "$(cat /tmp/hw_queue_r5d.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q "QUEUE DONE" /tmp/hw_queue_r5d.log 2>/dev/null; do
  sleep 120
done
echo "leg D finished at $(date -u +%H:%M:%S); chip free"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) at $(date -u +%H:%M:%S) ==="
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc after $((SECONDS - t0))s (log $LOG/$name.log) ==="
  echo "{\"stage\": \"$name\", \"rc\": $rc, \"wall_s\": $((SECONDS - t0))}" \
    >> "$LOG/stages.jsonl"
  return $rc
}

commit_stage() {
  local msg=$1; shift
  for i in 1 2 3; do
    git add "$@" 2>/dev/null && git commit -m "$msg" && return 0
    sleep 7
  done
  echo "commit_stage FAILED: $msg"
}

# ---- 1. mm9/mm1 (quick, feeds docs/PERF.md before round end) microbench with the accumulator-carry harness
run residual4 1800 python scripts/perf_residual.py --part2-only
commit_stage "MXU microbench: mm9/mm1 via the accumulator-carry harness" \
  docs/perf_residual.json

# ---- 2a. CelebA pipeline probe (t=20, tiny reps) with the fixed loader
run celebahq_probe 2400 python -m diffpure_tpu.cli \
  --exp ./exp_results --seed 0 --data_seed 0 \
  --config celeba.yml --domain celebahq \
  --diffusion_type celebahq-ddpm \
  --adv_batch_size 2 --num_sub 2 --t 20 \
  --adv_eps 0.062745098 --attack_version bpda \
  --classifier_name celebahq__Eyeglasses \
  --eot_defense_reps 2 --eot_attack_reps 2
probe_rc=$?

# ---- 2b. the full-length t*=500 composition run (only if the probe ran)
if [ "$probe_rc" -eq 0 ]; then
  run celebahq_t500 12000 python -m diffpure_tpu.cli \
    --exp ./exp_results --seed 0 --data_seed 0 \
    --config celeba.yml --domain celebahq \
    --diffusion_type celebahq-ddpm \
    --adv_batch_size 2 --num_sub 2 --t 500 \
    --adv_eps 0.062745098 --attack_version bpda \
    --classifier_name celebahq__Eyeglasses \
    --eot_defense_reps 20 --eot_attack_reps 15
fi
mkdir -p docs/celebahq_t500
cp "$LOG/celebahq_probe.log" docs/celebahq_t500/probe.log 2>/dev/null
cp "$LOG/celebahq_t500.log" docs/celebahq_t500/run.log 2>/dev/null
cp "$LOG/stages.jsonl" docs/celebahq_t500/stages.jsonl 2>/dev/null
commit_stage "CelebA-HQ t*=500 BPDA full-length protocol, one batch" \
  docs/celebahq_t500

echo "QUEUE E DONE at $(date -u +%H:%M:%S)"
