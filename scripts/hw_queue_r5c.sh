#!/usr/bin/env bash
# Round-5 hardware queue, leg C — the post-AA-suite re-prioritization.
# Launched after stage 3 of hw_queue_r5b.sh (the flagship AA standard
# suite) completes and the rest of that queue is killed: the remaining
# round wall-clock cannot fit r5b's stages 4-6 at their planned budgets,
# so this leg runs the guaranteed-cheap items first and gives the
# flagship-hard protocol (VERDICT r4 #3) a budget that fits, with the
# CelebA t*=500 composition run (VERDICT r4 #4) last-if-time.
#
#   setsid nohup bash scripts/hw_queue_r5c.sh >/tmp/hw_queue_r5c.log 2>&1 \
#     </dev/null & echo $! >/tmp/hw_queue_r5c.pid
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5c}
mkdir -p "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) at $(date -u +%H:%M:%S) ==="
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc after $((SECONDS - t0))s (log $LOG/$name.log) ==="
  echo "{\"stage\": \"$name\", \"rc\": $rc, \"wall_s\": $((SECONDS - t0))}" \
    >> "$LOG/stages.jsonl"
}

commit_stage() {  # commit_stage <message> <path...>
  local msg=$1; shift
  for i in 1 2 3; do
    git add "$@" 2>/dev/null && git commit -m "$msg" && return 0
    sleep 7
  done
  echo "commit_stage FAILED: $msg"
}

# ---- 1. mm9/mm1 microbench, anti-hoist harness (VERDICT #6, ~6 min)
run residual3 1800 python scripts/perf_residual.py --part2-only
commit_stage "MXU microbench: mm9/mm1 numbers via the anti-hoist harness" \
  docs/perf_residual.json

# ---- 2. drive the new CelebA vs_baseline bench field once (~4 min)
run celeba_bench 900 python bench.py --only celebahq_ddpm256_bf16

# ---- 3. de-saturation probe, reduced budget (~20 min)
run probe_c 2400 python scripts/defense_demo.py --hard --size 32 \
  --n_eval 16 --apgd_iter 20 --eot_iter 3 --attacks apgd-eot \
  --amp_min 0.08 --amp_max 0.18 --out "$LOG/probe_c"

AMPS=$(python - "$LOG/probe_c/results.json" <<'EOF'
import json, sys
try:
    r = json.load(open(sys.argv[1]))
    clean = r["sde"]["clean_acc"]; defended = r["sde"]["robust_acc_apgd_eot"]
except Exception:
    print("0.08 0.18"); raise SystemExit
if clean < 0.80:
    print("0.15 0.35")
elif defended >= 0.97:
    print("0.05 0.12")
else:
    print("0.08 0.18")
EOF
)
read -r AMP_MIN AMP_MAX <<<"$AMPS"
echo "=== probe_c chose amp range: $AMP_MIN $AMP_MAX ==="

# ---- 4. flagship-hard at a budget that fits the remaining wall-clock:
#         107M NCSN++ trained on the de-saturated mix, full protocol
#         (white-box APGD-EOT 50x5 + BPDA), n_eval=16, sde only
run flagship_hard 10800 python scripts/defense_demo.py --large --hard \
  --amp_min "$AMP_MIN" --amp_max "$AMP_MAX" \
  --apgd_iter 50 --eot_iter 5 --n_eval 16 \
  --out docs/defense_hard_flagship
cp "$LOG/flagship_hard.log" docs/defense_hard_flagship/run.log 2>/dev/null
commit_stage "Flagship-hard protocol: 107M NCSN++ on the de-saturated mix" \
  docs/defense_hard_flagship

# ---- 5. CelebA t*=500 BPDA composition, one batch, last-if-time
[ -d dataset/celebahq ] || python scripts/make_fixture_datasets.py \
  >"$LOG/fixtures.log" 2>&1
run celebahq_t500 10800 python -m diffpure_tpu.cli \
  --exp ./exp_results --seed 0 --data_seed 0 \
  --config celeba.yml --domain celebahq \
  --diffusion_type celebahq-ddpm \
  --adv_batch_size 2 --num_sub 2 --t 500 \
  --adv_eps 0.062745098 --attack_version bpda \
  --classifier_name celebahq__Eyeglasses \
  --eot_defense_reps 20 --eot_attack_reps 15
mkdir -p docs/celebahq_t500
cp "$LOG/celebahq_t500.log" docs/celebahq_t500/run.log
commit_stage "CelebA-HQ t*=500 BPDA full-length protocol, one batch" \
  docs/celebahq_t500

echo "QUEUE DONE at $(date -u +%H:%M:%S)"
