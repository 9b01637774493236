#!/usr/bin/env bash
# Round-5 hardware queue, leg D — resumed-session continuation.
#
# The r5b queue died mid-flagship_hard (machine reset); its sde section
# is complete and committed (docs/defense_hard_flagship/results.json,
# partial:true).  Remaining chip items, in priority order:
#   1. CelebA-HQ t*=500 BPDA full-length composition (VERDICT r4 #4,
#      queued twice, never executed) — preceded by a cheap t=20 probe so
#      a startup crash cannot eat the full leg budget.
#   2. AA standard suite on the de-saturated flagship weights — the
#      easy-mix flagship AA suite saturated at 100% everywhere
#      (docs/defense_demo_large_aa); rerunning it on the hard-mix
#      cached weights gives non-saturated per-attack numbers.
#   3. DPM++(2M)@20 resume leg for flagship-hard: completes the dpm
#      defense-equivalence section the dead run never reached, then
#      merges it into the main artifact and clears partial:true.
#
#   setsid nohup bash scripts/hw_queue_r5d.sh >/tmp/hw_queue_r5d.log 2>&1 \
#     </dev/null & echo $! >/tmp/hw_queue_r5d.pid
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5d}
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
  return $rc
}

commit_stage() {  # commit_stage <message> <path...>
  local msg=$1; shift
  for i in 1 2 3; do
    git add "$@" 2>/dev/null && git commit -m "$msg" && return 0
    sleep 7
  done
  echo "commit_stage FAILED: $msg"
}

# ---- 0. CelebA pipeline probe: t=20, tiny reps — catches any startup
#         crash (ckpt fallback, dataset fixture, 256px compile) cheaply
[ -d dataset/celebahq ] || python scripts/make_fixture_datasets.py \
  >"$LOG/fixtures.log" 2>&1
run celebahq_probe 2400 python -m diffpure_tpu.cli \
  --exp ./exp_results --seed 0 --data_seed 0 \
  --config celeba.yml --domain celebahq \
  --diffusion_type celebahq-ddpm \
  --adv_batch_size 2 --num_sub 2 --t 20 \
  --adv_eps 0.062745098 --attack_version bpda \
  --classifier_name celebahq__Eyeglasses \
  --eot_defense_reps 2 --eot_attack_reps 2

# ---- 1. CelebA-HQ t*=500 BPDA full-length protocol, one batch
#         (the reference's most expensive discrete loop:
#          run_celebahq_bpda_glasses.sh budgets at adv_batch 2)
if run celebahq_t500 12000 python -m diffpure_tpu.cli \
  --exp ./exp_results --seed 0 --data_seed 0 \
  --config celeba.yml --domain celebahq \
  --diffusion_type celebahq-ddpm \
  --adv_batch_size 2 --num_sub 2 --t 500 \
  --adv_eps 0.062745098 --attack_version bpda \
  --classifier_name celebahq__Eyeglasses \
  --eot_defense_reps 20 --eot_attack_reps 15; then :; fi
mkdir -p docs/celebahq_t500
cp "$LOG/celebahq_t500.log" docs/celebahq_t500/run.log 2>/dev/null
cp "$LOG/stages.jsonl" docs/celebahq_t500/stages.jsonl 2>/dev/null
commit_stage "CelebA-HQ t*=500 BPDA full-length protocol, one batch" \
  docs/celebahq_t500

# ---- 2. AA standard suite on the de-saturated flagship weights
mkdir -p docs/defense_hard_flagship_aa
[ -f docs/defense_hard_flagship_aa/trained_weights.pkl ] || \
  cp docs/defense_hard_flagship/trained_weights.pkl \
     docs/defense_hard_flagship_aa/trained_weights.pkl
run hard_aa 9000 python scripts/defense_demo.py --large --hard \
  --amp_min 0.08 --amp_max 0.18 --aa_iter 100 --n_eval 16 \
  --attacks aa-standard --out docs/defense_hard_flagship_aa
cp "$LOG/hard_aa.log" docs/defense_hard_flagship_aa/run.log 2>/dev/null
commit_stage "AA standard suite on the de-saturated flagship defense" \
  docs/defense_hard_flagship_aa/results.json \
  docs/defense_hard_flagship_aa/run.log

# ---- 3. DPM++@20 resume leg for flagship-hard (defense-equivalence
#         of accelerated purification in the de-saturated regime)
mkdir -p docs/defense_hard_flagship_dpm
[ -f docs/defense_hard_flagship_dpm/trained_weights.pkl ] || \
  cp docs/defense_hard_flagship/trained_weights.pkl \
     docs/defense_hard_flagship_dpm/trained_weights.pkl
run hard_dpm 7200 python scripts/defense_demo.py --large --hard \
  --amp_min 0.08 --amp_max 0.18 --apgd_iter 50 --eot_iter 5 --n_eval 32 \
  --dtypes dpm --out docs/defense_hard_flagship_dpm
cp "$LOG/hard_dpm.log" docs/defense_hard_flagship_dpm/run.log 2>/dev/null
python - <<'EOF'
import json, os
main_p = "docs/defense_hard_flagship/results.json"
dpm_p = "docs/defense_hard_flagship_dpm/results.json"
if os.path.exists(dpm_p):
    main = json.load(open(main_p))
    dpm = json.load(open(dpm_p))
    if "dpm20" in dpm and not dpm.get("partial"):
        main["dpm20"] = dpm["dpm20"]
        main["dpm20"]["resume_leg"] = "docs/defense_hard_flagship_dpm"
        main.pop("partial", None)
        json.dump(main, open(main_p, "w"), indent=2)
        print("merged dpm20 section; partial flag cleared")
    else:
        print("dpm leg incomplete; main artifact left as-is")
EOF
commit_stage "Flagship-hard DPM++@20 resume leg: defense-equivalence section" \
  docs/defense_hard_flagship_dpm/results.json \
  docs/defense_hard_flagship_dpm/run.log \
  docs/defense_hard_flagship/results.json

echo "QUEUE DONE at $(date -u +%H:%M:%S)"
