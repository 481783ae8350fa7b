"""Summarize the instrumented kl_ppo flagship run for docs/KL_PPO_NOTES.md.

Reads a metrics.jsonl with the round-4 instrumentation (policy_std/min,
kl_mean_part/kl_cov_part, kl_penalty_beta mean/max, grad_norm_actor) and
prints (a) a trajectory table at representative iterations, (b) the
hypothesis-level summary stats: where the KL budget went (cov share),
whether sigma collapsed (std trajectory + floor activity), and the beta
controller's operating point.

Usage: python scripts/kl_ppo_report.py docs/runs/r8_kl_ppo_insertion/metrics.jsonl
"""
import json
import sys

import numpy as np


def main(path):
    rows = [json.loads(l) for l in open(path)]
    n = len(rows)
    picks = sorted({0, 2, 5, 10, 20, 40, 80, 120, 160, n - 1} & set(range(n))) or [0]
    cols = [
        ("iter", lambda r, i: i),
        ("reward", lambda r, i: round(r.get("train/reward", float("nan")), 1)),
        ("kl", lambda r, i: round(r.get("kl", float("nan")), 4)),
        ("kl_cov_share", lambda r, i: round(r.get("kl_cov_part", 0.0) / max(r.get("kl", 1e-12), 1e-12), 3)),
        ("std", lambda r, i: round(r.get("policy_std", float("nan")), 3)),
        ("std_min", lambda r, i: round(r.get("policy_std_min", float("nan")), 4)),
        ("entropy", lambda r, i: round(r.get("entropy", float("nan")), 2)),
        ("beta", lambda r, i: round(r.get("kl_penalty_beta", float("nan")), 3)),
        ("beta_max", lambda r, i: round(r.get("kl_penalty_beta_max", float("nan")), 3)),
        ("gnorm", lambda r, i: round(r.get("grad_norm_actor", float("nan")), 2)),
    ]
    print("| " + " | ".join(c for c, _ in cols) + " |")
    print("|" + "---|" * len(cols))
    for i in picks:
        print("| " + " | ".join(str(f(rows[i], i)) for _, f in cols) + " |")

    kl = np.array([r.get("kl", np.nan) for r in rows])
    cov = np.array([r.get("kl_cov_part", np.nan) for r in rows])
    std = np.array([r.get("policy_std", np.nan) for r in rows])
    stdm = np.array([r.get("policy_std_min", np.nan) for r in rows])
    beta = np.array([r.get("kl_penalty_beta", np.nan) for r in rows])
    bmax = np.array([r.get("kl_penalty_beta_max", np.nan) for r in rows])
    ent = np.array([r.get("entropy", np.nan) for r in rows])
    rew = np.array([r.get("train/reward", np.nan) for r in rows])
    print()
    h = n // 2
    print(f"iters: {n};  reward: start {rew[0]:.0f} -> mid {rew[h]:.0f} -> end {rew[-1]:.0f}")
    print(f"cov share of KL: first10 {np.nanmean(cov[:10]/np.maximum(kl[:10],1e-12)):.3f}  "
          f"mid {np.nanmean(cov[h-5:h+5]/np.maximum(kl[h-5:h+5],1e-12)):.3f}  "
          f"last10 {np.nanmean(cov[-10:]/np.maximum(kl[-10:],1e-12)):.3f}")
    print(f"policy_std: start {std[0]:.3f} -> min {np.nanmin(std):.3f} (iter {int(np.nanargmin(std))}) -> end {std[-1]:.3f}")
    print(f"policy_std_min: overall min {np.nanmin(stdm):.4f}  (floor 0.05 binding: {bool(np.nanmin(stdm) <= 0.0505)})")
    print(f"entropy: start {ent[0]:.2f} -> end {ent[-1]:.2f}  (TRPL flagship: 8.56 -> 11.74)")
    print(f"beta operating point: median {np.nanmedian(beta):.3f}  p90 {np.nanpercentile(beta,90):.3f}  "
          f"max-of-maxes {np.nanmax(bmax):.3f}  bang-bang ratio (beta_max/beta) median "
          f"{np.nanmedian(bmax/np.maximum(beta,1e-12)):.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "docs/runs/r8_kl_ppo_insertion/metrics.jsonl")
