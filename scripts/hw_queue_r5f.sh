#!/usr/bin/env bash
# Round-5 hardware queue, leg F — post-r5e items, all dependent on the
# jit_lifted capture fix (TypedNdArray consts were passed through
# host-side and re-uploaded ~430 MB per dispatch; the hard_aa leg was
# host-OOM-killed at 129 GB because of it):
#   1. Flagship-hard AA standard suite, full self-contained rerun — the
#      r5d leg died after apgd-ce (62.5% robust); rerunning all four
#      attacks in one run keeps the robust-subset phase semantics intact.
#   2. Flagship-hard DPM++@20 resume leg if the r5d hard_dpm run timed
#      out before its white-box section (merge step clears partial:true).
#
#   setsid nohup bash scripts/hw_queue_r5f.sh >/tmp/hw_queue_r5f.log 2>&1 \
#     </dev/null & echo $! >/tmp/hw_queue_r5f.pid
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5f}
mkdir -p "$LOG"

while kill -0 "$(cat /tmp/hw_queue_r5e.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q "QUEUE E DONE" /tmp/hw_queue_r5e.log 2>/dev/null; do
  sleep 120
done
echo "leg E finished at $(date -u +%H:%M:%S); chip free"

# Stages are skipped once past the deadline so the chip is free when the
# round driver runs bench.py (a contended chip would corrupt the headline
# numbers). Override with HW_QUEUE_DEADLINE=HH:MM (UTC).
DEADLINE=${HW_QUEUE_DEADLINE:-19:45}
past_deadline() {
  [ "$(date -u +%H:%M)" \> "$DEADLINE" ]
}

run() {
  local name=$1 tmo=$2; shift 2
  if past_deadline; then
    echo "=== $name: SKIPPED (past $DEADLINE UTC deadline) ==="
    echo "{\"stage\": \"$name\", \"rc\": -1, \"skipped\": \"deadline\"}" \
      >> "$LOG/stages.jsonl"
    return 125
  fi
  # clamp the timeout to the deadline so no stage holds the chip past it
  local now_s dl_s left
  now_s=$(date -u +%s)
  dl_s=$(date -u -d "today $DEADLINE" +%s 2>/dev/null || echo $((now_s + tmo)))
  left=$((dl_s - now_s))
  [ "$left" -gt 60 ] && [ "$left" -lt "$tmo" ] && tmo=$left
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

# ---- 0. MXU microbench rerun: the r5e run measured mm9 96% / mm1 84%
#         of peak but lost them to an unguarded later compile failure;
#         each kernel is now individually guarded (~5 min)
run residual5 1800 python scripts/perf_residual.py --part2-only
commit_stage "MXU microbench: per-kernel guards land the mm9/mm1 numbers" \
  docs/perf_residual.json

# ---- 1. Flagship-hard AA standard suite, self-contained rerun.
#         --skip_accounting: the clean/transfer section already landed in
#         the r5d partial artifact; the suite itself re-reports initial
#         accuracy. Weights are the cached hard-mix 107M ones.
run hard_aa2 14000 python scripts/defense_demo.py --large --hard \
  --amp_min 0.08 --amp_max 0.18 --aa_iter 100 --n_eval 16 \
  --skip_accounting --attacks aa-standard \
  --out docs/defense_hard_flagship_aa
cp "$LOG/hard_aa2.log" docs/defense_hard_flagship_aa/run.log 2>/dev/null
commit_stage "Flagship-hard AA standard suite: self-contained rerun post OOM fix" \
  docs/defense_hard_flagship_aa/results.json \
  docs/defense_hard_flagship_aa/run.log

# ---- 2. DPM++@20 resume leg, only if the r5d run left it partial
need_dpm=$(python - <<'EOF'
import json, os
p = "docs/defense_hard_flagship_dpm/results.json"
if not os.path.exists(p):
    print("yes"); raise SystemExit
d = json.load(open(p))
dpm = d.get("dpm20", {})
print("no" if "robust_acc_apgd_eot" in dpm and "robust_acc_bpda" in dpm
      else "yes")
EOF
)
if [ "$need_dpm" = "yes" ]; then
  run hard_dpm2 10000 python scripts/defense_demo.py --large --hard \
    --amp_min 0.08 --amp_max 0.18 --apgd_iter 50 --eot_iter 5 --n_eval 32 \
    --dtypes dpm --out docs/defense_hard_flagship_dpm
  cp "$LOG/hard_dpm2.log" docs/defense_hard_flagship_dpm/run.log 2>/dev/null
fi
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
commit_stage "Flagship-hard DPM++@20: white-box section + artifact merge" \
  docs/defense_hard_flagship_dpm/results.json \
  docs/defense_hard_flagship_dpm/run.log \
  docs/defense_hard_flagship/results.json

echo "QUEUE F DONE at $(date -u +%H:%M:%S)"
