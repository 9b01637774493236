#!/usr/bin/env bash
# Round-5 hardware queue, leg B (sequential — ONE process may hold the
# chip). The first r5 queue died with a machine reset after stage 2's
# accounting phase; the untracked trained-weights caches died with it, so
# the AA standard suite reruns here as ONE self-contained leg (fresh
# training, accounting, all four attacks) — no cross-leg weight-identity
# argument needed. results.json is now written incrementally after every
# finished phase (scripts/defense_demo.py), so a third death cannot strand
# a multi-hour run without artifacts.
#
# Launch DETACHED (setsid) so it survives the driving session:
#   setsid nohup bash scripts/hw_queue_r5b.sh >/tmp/hw_queue_r5b.log 2>&1 \
#     </dev/null & echo $! >/tmp/hw_queue_r5b.pid
#
# Stages (VERDICT r4 "Next round", cheapest-guaranteed first):
#   1. residual microbench --part2-only     (VERDICT #6 — mm9/mm1 fields)
#   2. ddim50 grad bench                    (VERDICT #5 — GRADIENTS.md)
#   3. flagship AA standard suite, full     (VERDICT #2)
#   4. de-saturation probe (nf=32, 32px) -> amp choice
#   5. flagship-hard: 107M on the de-saturated mix (VERDICT #3)
#   6. full-length CelebA t*=500 BPDA, one batch of 2 (VERDICT #4;
#      partial wall-clock/log is still protocol-composition evidence)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5b}
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
    sleep 7   # index lock contention with the interactive session
  done
  echo "commit_stage FAILED: $msg"
}

# ---- 1. mm9/mm1 MXU microbench (fixed CSE-proof harness) — VERDICT #6
run residual2 1800 python scripts/perf_residual.py --part2-only
commit_stage "Land the mm9/mm1 MXU microbench via the CSE-proof harness" \
  docs/perf_residual.json

# ---- 2. ddim50 grad workload once, for GRADIENTS.md — VERDICT #5
run ddim50_grad 3600 python bench.py --only imagenet256_ddim50_grad
cp "$LOG/ddim50_grad.log" docs/ddim50_grad_bench.log 2>/dev/null
commit_stage "Measure the ddim50-respaced ImageNet-256 gradient route" \
  docs/ddim50_grad_bench.log

# ---- 3. flagship AA standard suite, one self-contained leg — VERDICT #2
run flagship_aa 18000 python scripts/defense_demo.py --large \
  --aa_iter 100 --n_eval 16 --attacks aa-standard \
  --out docs/defense_demo_large_aa
cp "$LOG/flagship_aa.log" docs/defense_demo_large_aa/run_full.log
commit_stage "Flagship AA standard suite: full self-contained run" \
  docs/defense_demo_large_aa/results.json \
  docs/defense_demo_large_aa/run_full.log

# ---- 4. de-saturation probe at 32px with the cheap nf=32 score model
run probe_b 2700 python scripts/defense_demo.py --hard --size 32 \
  --n_eval 32 --apgd_iter 30 --eot_iter 3 --attacks apgd-eot \
  --amp_min 0.08 --amp_max 0.18 --out "$LOG/probe_b"

# amp choice: defended must land strictly between undefended and clean.
# The 107M purifier is stronger than the nf=32 probe's, so bias one
# notch harder when the probe is near-saturated.
AMPS=$(python - "$LOG/probe_b/results.json" <<'EOF'
import json, sys
try:
    r = json.load(open(sys.argv[1]))
    clean = r["sde"]["clean_acc"]; defended = r["sde"]["robust_acc_apgd_eot"]
except Exception:
    print("0.08 0.18"); raise SystemExit   # probe died: keep the default
if clean < 0.80:                 # too hard: classifier/purifier can't work
    print("0.15 0.35")           # fall back to the 16px-proven hard preset
elif defended >= 0.97:           # (near-)saturated for nf=32 -> the 107M
    print("0.05 0.12")           # purifier would re-saturate; go harder
else:
    print("0.08 0.18")
EOF
)
read -r AMP_MIN AMP_MAX <<<"$AMPS"
echo "=== probe_b chose amp range: $AMP_MIN $AMP_MAX ==="

# ---- 5. flagship-hard: 107M on the de-saturated distribution — VERDICT #3
run flagship_hard 13500 python scripts/defense_demo.py --large --hard --dpm \
  --amp_min "$AMP_MIN" --amp_max "$AMP_MAX" \
  --apgd_iter 50 --eot_iter 5 --n_eval 32 \
  --out docs/defense_hard_flagship
cp "$LOG/flagship_hard.log" docs/defense_hard_flagship/run.log 2>/dev/null
commit_stage "Flagship-hard protocol: 107M NCSN++ on the de-saturated mix" \
  docs/defense_hard_flagship/results.json docs/defense_hard_flagship/run.log

# ---- 6. full-length CelebA t*=500 BPDA protocol, one batch of 2
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
