#!/bin/bash
# Round-3 TPU queue: runs SEQUENTIALLY the moment the axon relay recovers
# (one real chip; concurrent jobs stall each other). Stages, priority order:
#   1. two-agents entropy-control rerun (round-2 attempt died with the relay;
#      fix validated through iter 23 — see PLAN.md queue #1)
#   2. material-physics robustness evals: flagship pushing + sliding policies
#      evaluated with the velocity-pass material enabled
#      (dynamic_friction_scale=1.0 — PhysX default dynamic==static friction)
#   3. short material-on learn-check (pushing): training remains stable with
#      the full velocity pass active
#   4. bench.py refresh -> docs/bench_r3.json
set -u
cd /root/repo
LOG=docs/r3_queue.log
echo "[r3] start $(date)" >> "$LOG"

# --- 1. two-agents entropy control (train + eval inside the script)
bash scripts/r2_two_agents_entctl.sh
echo "[r3] entctl done rc=$? $(date)" >> "$LOG"

# --- 2. material-on learn-checks (the machine was reset between sessions:
# the round-2 flagship checkpoints in logs/ are gone, so instead of evaluating
# old policies under the velocity-pass material we train short from-scratch
# learn-checks WITH the material enabled — this exercises the body-pair pass
# end-to-end, which is the point of PLAN.md queue #4)
timeout 7200 python scripts/learn_check.py --task rigid_pushing --model hepi \
  --num-envs 512 --iterations 40 --env-kw dynamic_friction_scale=1.0 \
  --out docs/learn_material_pushing_r3.json \
  > docs/learn_material_pushing_r3.log 2>&1
echo "[r3] learn-check pushing(material) rc=$?" >> "$LOG"
timeout 7200 python scripts/learn_check.py --task rigid_sliding --model hepi \
  --num-envs 512 --iterations 40 --env-kw dynamic_friction_scale=1.0 \
  --out docs/learn_material_sliding_r3.json \
  > docs/learn_material_sliding_r3.log 2>&1
echo "[r3] learn-check sliding(material) rc=$?" >> "$LOG"

# --- 4. bench refresh
timeout 3600 python bench.py > docs/bench_r3.json 2>docs/bench_r3.err
echo "[r3] bench rc=$?" >> "$LOG"
# refresh the stale-fallback snapshot with the newest on-chip line
python - <<'EOF'
import json
try:
    with open("docs/bench_r3.json") as f:
        rec = json.loads(f.read().strip().splitlines()[-1])
    if not rec.get("stale") and rec.get("value", 0) > 0:
        import datetime
        rec["measured_at"] = datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%MZ")
        rec["source"] = "docs/bench_r3.json (one v5e chip via axon tunnel)"
        with open("docs/bench_last_good_tpu.json", "w") as f:
            json.dump(rec, f, indent=1)
except Exception as e:
    print("snapshot refresh skipped:", e)
EOF

# --- 5. update-phase op profile refresh (post flattened-layout): where do the
# 20.1 ms/grad-step go now? Feeds the round-3 MFU work (PLAN.md queue #2).
timeout 2400 python scripts/profile_update2.py > docs/profile_update_r3.log 2>&1
echo "[r3] profile_update2 rc=$?" >> "$LOG"
echo "[r3] done $(date)" >> "$LOG"
