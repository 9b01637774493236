#!/usr/bin/env bash
# Round-5 hardware queue, leg G — the CelebA-HQ t*=500 BPDA protocol with
# bounded dispatches. Leg E's attempt crashed the TPU worker on the first
# defended dispatch (20 defense reps x 500 UNet evals in ONE program —
# execution watchdog); the BPDA driver now chunks both the defense vote
# and the attack-EOT reps into watchdog-safe dispatches
# (attacks/bpda_eot.py attack_batch, chunked-vs-monolithic tested).
#
#   setsid nohup bash scripts/hw_queue_r5g.sh >/tmp/hw_queue_r5g.log 2>&1 \
#     </dev/null & echo $! >/tmp/hw_queue_r5g.pid
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_queue_r5g}
mkdir -p "$LOG"

while kill -0 "$(cat /tmp/hw_queue_r5f.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q "QUEUE F DONE" /tmp/hw_queue_r5f.log 2>/dev/null; do
  sleep 60
done
echo "leg F finished at $(date -u +%H:%M:%S); chip free"

# Leave margin before the round driver's bench run (19:45 UTC round end).
DEADLINE=${HW_QUEUE_DEADLINE:-19:15}
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

# ---- CelebA-HQ t*=500, full reference shape (20/15 reps, 50 PGD steps,
#      one batch of 2), bounded dispatches: defense vote in chunks of 4
#      reps, attack EOT in chunks of 3 reps -> <=8 images x 500 evals per
#      dispatch (~23 s device time at 11.3 ms/eval-of-2).
#      Estimated total: ~1h25m; per-step progress lines in the log are
#      the partial-completion record if the deadline clamps it.
run celebahq_t500_v2 9000 python -m diffpure_tpu.cli \
  --exp ./exp_results --seed 0 --data_seed 0 \
  --config celeba.yml --domain celebahq \
  --diffusion_type celebahq-ddpm \
  --adv_batch_size 2 --num_sub 2 --t 500 \
  --adv_eps 0.062745098 --attack_version bpda \
  --classifier_name celebahq__Eyeglasses \
  --eot_defense_reps 20 --eot_attack_reps 15 \
  --eot_defense_batch 4 --eot_attack_batch 3
rc=$?
cp "$LOG/celebahq_t500_v2.log" docs/celebahq_t500/run2.log 2>/dev/null
cp "$LOG/stages.jsonl" docs/celebahq_t500/stages_legG.jsonl 2>/dev/null
python - <<EOF
import json, re, os
log = open("docs/celebahq_t500/run2.log").read() \
    if os.path.exists("docs/celebahq_t500/run2.log") else ""
steps = re.findall(r"^\[bpda\] step (\d+)/50: defended (\d+)/2 \((\d+)s\)",
                   log, re.M)
out = {
    "rc": $rc,
    "protocol": "t*=500, def/atk reps 20/15, 50 PGD steps, eps 16/255, "
                "batch 2, random weights (no pretrained ckpt in env)",
    "dispatch_bounds": {"eot_defense_batch": 4, "eot_attack_batch": 3},
    "defended_steps_completed": len(steps),
    "last_step": dict(zip(("step", "defended", "cum_wall_s"),
                          map(int, steps[-1]))) if steps else None,
}
mm = [x for x in re.finditer(
    r"^init acc: ([\d.]+)%, robust acc: ([\d.]+)% \(([\d.]+)s\)", log, re.M)]
if mm:
    out["defended"] = {"init_acc_pct": float(mm[-1].group(1)),
                       "robust_acc_pct": float(mm[-1].group(2)),
                       "wall_s": float(mm[-1].group(3))}
json.dump(out, open("docs/celebahq_t500/results2.json", "w"), indent=2)
print(json.dumps(out, indent=2))
EOF
commit_stage "CelebA-HQ t*=500 BPDA run 2: bounded dispatches" \
  docs/celebahq_t500

echo "QUEUE G DONE at $(date -u +%H:%M:%S)"
