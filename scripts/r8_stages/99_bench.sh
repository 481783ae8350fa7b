# fresh on-chip bench + last-good snapshot refresh
timeout 1800 python bench.py > docs/bench_r8.json 2>docs/bench_r8.err
echo "[r8] bench rc=$? $(date)" >> "$LOG"
python - <<'PYEOF'
import json, datetime
try:
    with open("docs/bench_r8.json") as f:
        rec = json.loads(f.read().strip().splitlines()[-1])
    if not rec.get("stale") and rec.get("value", 0) > 0:
        rec["measured_at"] = datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%MZ")
        rec["source"] = "docs/bench_r8.json (one v5e chip via axon tunnel)"
        with open("docs/bench_last_good_tpu.json", "w") as f:
            json.dump(rec, f, indent=1)
except Exception as e:
    print("snapshot refresh skipped:", e)
PYEOF
