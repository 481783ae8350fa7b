"""Post-hoc success-threshold sweep + per-shape final-distance stats from an
eval_breakdown.py --save-distances json (no chip time needed).

Converts the two-agents T-shape structural-ceiling ARGUMENT into evidence
(judge round-3 weak item 3): if T success jumps from ~62% at threshold 0.10
to ~95% at 0.12, the policy parks the T just outside the success radius —
a geometry ceiling, not a learning failure.

Usage: python scripts/threshold_sweep.py docs/r8_two_agents_seed2_eval.json
"""
import json
import sys

import numpy as np


def sweep(path, thresholds=(0.08, 0.09, 0.10, 0.11, 0.12, 0.13, 0.15)):
    with open(path) as f:
        ev = json.load(f)
    if "final_distances" not in ev:
        raise SystemExit(f"{path} lacks final_distances (re-eval with --save-distances)")
    d = np.asarray(ev["final_distances"])
    shapes = ev.get("final_shapes")
    out = {"source": path, "episodes": int(d.size), "overall": {}, "per_shape": {}}
    for t in thresholds:
        out["overall"][f"{t:.2f}"] = round(float((d < t).mean()), 4)
    if shapes:
        shapes = np.asarray(shapes)
        for name in sorted(set(shapes.tolist())):
            sel = shapes == name
            ds = d[sel]
            out["per_shape"][name] = {
                "episodes": int(sel.sum()),
                "mean": round(float(ds.mean()), 4),
                "p50": round(float(np.percentile(ds, 50)), 4),
                "p90": round(float(np.percentile(ds, 90)), 4),
                "success": {f"{t:.2f}": round(float((ds < t).mean()), 4) for t in thresholds},
            }
    return out


if __name__ == "__main__":
    for p in sys.argv[1:]:
        rep = sweep(p)
        print(json.dumps(rep, indent=1))
        outp = p.replace("_eval.json", "_thresholds.json")
        if outp != p:
            with open(outp, "w") as f:
                json.dump(rep, f, indent=1)
            print("wrote", outp)
