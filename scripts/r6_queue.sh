#!/bin/bash
# Round-3 overnight queue (runs after scripts/r5_two_agents_followup.sh).
# Completes the reference's full 15-config task x model matrix at reference
# budgets (the 4 configs still lacking full-budget artifacts:
# rigid_insertion_two_agents x {empn, transformer} @ 10M,
# rigid_pushing x {empn, transformer} @ 30M — cf.
# /root/reference/configs/*_cfg.yaml), then flagship scoreboard refreshes
# on shipped code (VERDICT item 9), then a fresh on-chip bench.
#
# Strictly serial — the axon relay is exclusive (a second JAX client blocks
# in backend init). Every stage is start-deadline-guarded so the chip is
# free for the driver's end-of-round bench (~05:40 UTC 2026-08-20).
set -u
cd /root/repo
LOG=docs/r6_queue.log
now() { date +%s; }

# Gate: wait for the r5 follow-up to finish ([r5-2afu] done) or its watcher
# to die (crash/reset), with a hard fallback time.
GATE_DEADLINE=$(date -d '2026-08-20 01:00 UTC' +%s)
while [ "$(now)" -lt "$GATE_DEADLINE" ]; do
  grep -q "^\[r5-2afu\] done" docs/r5_queue.log 2>/dev/null && break
  w=$(cat /tmp/r5watch.pid 2>/dev/null || true)
  if [ -n "${w:-}" ] && [ ! -d "/proc/$w" ]; then
    # watcher gone — give any orphaned train job a grace period, then go
    sleep 180
    break
  fi
  sleep 60
done
echo "[r6] gate open $(date)" >> "$LOG"

run_stage() {
  # name cfg threshold start_deadline timeout extra_overrides...
  local name=$1 cfg=$2 thr=$3 dl=$4 tmo=$5; shift 5
  if [ "$(now)" -gt "$(date -d "$dl UTC" +%s)" ]; then
    echo "[r6:$name] SKIP past start deadline $dl $(date)" >> "$LOG"
    return 0
  fi
  echo "[r6:$name] train start $(date)" >> "$LOG"
  timeout "$tmo" python -m geometry_rl_tpu.train.cli --config "$cfg" \
    --override "logger.log_dir=logs/r6_$name" \
      logger.checkpoint.save_interval=20 "$@" \
    > "docs/r6_${name}.log" 2>&1
  echo "[r6:$name] train rc=$? $(date)" >> "$LOG"
  local rdir
  rdir=$(ls -d logs/r6_$name/* 2>/dev/null | tail -1)
  [ -z "${rdir:-}" ] && return 0
  timeout 2400 python scripts/eval_breakdown.py --run-dir "$rdir" \
    --threshold "$thr" --out "docs/r6_${name}_eval.json" \
    >> "docs/r6_${name}.log" 2>&1
  echo "[r6:$name] eval rc=$? run=$rdir $(date)" >> "$LOG"
  mkdir -p "docs/runs/r6_$name"
  cp "$rdir"/metrics.jsonl "$rdir"/hparams.json "docs/runs/r6_$name/" 2>/dev/null
}

# 0. rescue: the ppo_insertion train hit a ~40-min relay stall at iter 167
# and its timeout killed it at iter ~196/200 (checkpoints through 180 +
# best@186 saved). Resume from the last checkpoint to the full 20.48M
# budget (~20 iters, ~5 min), then eval.
if [ ! -f docs/r5_ppo_insertion_eval.json ]; then
  pr=$(ls -d logs/r5_ppo_insertion/* 2>/dev/null | tail -1)
  if [ -n "${pr:-}" ] && [ -d "$pr/checkpoints" ]; then
    echo "[r6:ppo_rescue] resume-finish start run=$pr $(date)" >> "$LOG"
    timeout 2400 python -m geometry_rl_tpu.train.cli \
      --config rigid_insertion_multi_hepi_trpl \
      --override logger.log_dir=logs/r6_ppo_finish \
        logger.checkpoint.save_interval=20 \
        collector.total_frames=20480000 \
        env.num_envs=1024 env.kwargs.warmup_steps=0 \
        collector.frames_per_batch=102400 \
        algo=ppo \
      --resume "$pr/checkpoints" \
      >> docs/r5_ppo_insertion.log 2>&1
    rc=$?
    echo "[r6:ppo_rescue] resume-finish rc=$rc $(date)" >> "$LOG"
    fr=$(ls -d logs/r6_ppo_finish/* 2>/dev/null | tail -1)
    # eval the finished run if it exists, else the stalled run's best@186
    tgt=${fr:-$pr}
    timeout 2400 python scripts/eval_breakdown.py --run-dir "$tgt" \
      --threshold 0.1 --out docs/r5_ppo_insertion_eval.json \
      >> docs/r5_ppo_insertion.log 2>&1
    echo "[r6:ppo_rescue] eval rc=$? run=$tgt $(date)" >> "$LOG"
    mkdir -p docs/runs/r5_ppo_insertion
    cp "$pr"/metrics.jsonl "$pr"/hparams.json docs/runs/r5_ppo_insertion/ 2>/dev/null
    if [ -n "${fr:-}" ]; then
      cp "$fr"/metrics.jsonl docs/runs/r5_ppo_insertion/metrics_finish.jsonl 2>/dev/null
    fi
  fi
fi

# 0.5. two-agents seed variance (VERDICT item 1): the stable-config runs
# land 85.6-88.9% vs the unstable r1 run's 90.8%; 30M frames did not move
# the 15M result (85.6% vs 86.5%, T ~61% in both). A second seed tests
# whether 90.8% was seed luck. Runs the full train+eval+sweep script.
if [ "$(now)" -lt "$(date -d '2026-08-20 02:40 UTC' +%s)" ]; then
  bash scripts/r6_two_agents_seed2.sh
else
  echo "[r6:2a_seed2] SKIP past start deadline $(date)" >> "$LOG"
fi

# 1-4. remaining task x model matrix at reference budgets (value order:
# short runs first; the ~105-min EMPN pushing run last of the four so a
# late start drops it rather than the others)
run_stage two_agents_empn rigid_insertion_two_agents_multi_empn_trpl 0.1 \
  "2026-08-20 03:30" 4200
run_stage two_agents_transformer rigid_insertion_two_agents_multi_transformer_trpl 0.1 \
  "2026-08-20 03:55" 2400
run_stage pushing_transformer rigid_pushing_multi_transformer_trpl 0.1 \
  "2026-08-20 03:35" 3600
run_stage pushing_empn rigid_pushing_multi_empn_trpl 0.1 \
  "2026-08-20 02:15" 7200

# 5-6. flagship scoreboard refreshes on shipped code (rope_shaping skipped:
# its r2 artifact is current — no default-path code change touches it)
run_stage pushing_hepi rigid_pushing_multi_hepi_trpl 0.1 \
  "2026-08-20 03:05" 6000
run_stage sliding_hepi rigid_sliding_multi_hepi_trpl 0.1 \
  "2026-08-20 03:30" 4800

# 7. fresh on-chip bench + last-good snapshot refresh
if [ "$(now)" -lt "$(date -d '2026-08-20 04:25 UTC' +%s)" ]; then
  timeout 1800 python bench.py > docs/bench_r6.json 2>docs/bench_r6.err
  echo "[r6] bench rc=$? $(date)" >> "$LOG"
  python - <<'EOF'
import json
try:
    with open("docs/bench_r6.json") as f:
        rec = json.loads(f.read().strip().splitlines()[-1])
    if not rec.get("stale") and rec.get("value", 0) > 0:
        import datetime
        rec["measured_at"] = datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%MZ")
        rec["source"] = "docs/bench_r6.json (one v5e chip via axon tunnel)"
        with open("docs/bench_last_good_tpu.json", "w") as f:
            json.dump(rec, f, indent=1)
except Exception as e:
    print("snapshot refresh skipped:", e)
EOF
else
  echo "[r6] bench SKIP past deadline $(date)" >> "$LOG"
fi
echo "[r6] done $(date)" >> "$LOG"
