"""Build the HEPi-vs-baselines and algorithm-family comparison tables.

The reference exists to compare HEPi against non-equivariant baselines across
task x model configs (configs/rigid_insertion_multi_{empn,transformer}_trpl_cfg.yaml,
configs/cloth_hanging_multi_*_trpl_cfg.yaml) and registers three algorithm
families (configs/algorithm/{trpl,ppo,kl_ppo}.yaml) — this emits both
comparisons from our full-budget run artifacts: final deterministic success,
per-shape minimum, sample efficiency (frames to reach a reward level), and
wall-clock cost.

    python scripts/model_comparison.py   # writes docs/MODEL_COMPARISON.md
                                         #      + docs/ALGO_COMPARISON.md
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (task, model label, run artifacts dir, eval json, reward levels for
# sample-efficiency). Reward levels are shared per task so models are
# comparable: "frames until train/reward first exceeds level".
GROUPS = [
    (
        "rigid_insertion (20M frames)",
        [
            ("HEPi", "docs/runs/r5_hepi_insertion", "docs/r5_hepi_insertion_eval.json"),
            ("EMPN", "docs/runs/r5_empn_insertion", "docs/r5_empn_insertion_eval.json"),
            ("Transformer", "docs/runs/r5_transformer_insertion", "docs/r5_transformer_insertion_eval.json"),
        ],
        [-35.0, -30.0, -27.0],
    ),
    (
        "cloth_hanging (5M frames) — DRAW-SENSITIVE: HEPi success@0.2 spans "
        "44–89% over 9 semantically-identical runs (median 60%; "
        "docs/CLOTH_REGRESSION.md). EMPN/Transformer are single draws; "
        "EMPN's 56% sits inside HEPi's draw band (not separable at n=1), "
        "Transformer's 26% is below every HEPi draw.",
        [
            ("HEPi best draw", "docs/runs/r8_cloth_r2code", "docs/r8_cloth_r2code_eval.json"),
            ("HEPi median draw", "docs/runs/r8_cloth_seed4", "docs/r8_cloth_seed4_eval.json"),
            ("EMPN", "docs/runs/r5_empn_cloth", "docs/r5_empn_cloth_eval.json"),
            ("Transformer", "docs/runs/r5_transformer_cloth", "docs/r5_transformer_cloth_eval.json"),
        ],
        [-150.0, -110.0],
    ),
    (
        "rigid_pushing (30M frames)",
        [
            # HEPi: prefer the round-4 shipped-code refresh, else the r2 flagship
            ("HEPi", "docs/runs/r8_pushing_hepi", "docs/r8_pushing_hepi_eval.json"),
            ("HEPi (r2)", "docs/runs/r2_pushing", "docs/runs/r2_pushing/eval_breakdown.json"),
            ("EMPN", "docs/runs/r8_pushing_empn", "docs/r8_pushing_empn_eval.json"),
            ("Transformer", "docs/runs/r8_pushing_transformer", "docs/r8_pushing_transformer_eval.json"),
        ],
        [-40.0, -25.0],
    ),
    (
        "rigid_insertion_two_agents (reference budget 10M; the @15M row is the "
        "round-3 KL-stability-fix flagship, kept for continuity)",
        [
            # distinct base labels so BOTH HEPi budgets render as rows
            ("HEPi @10M", "docs/runs/r8_two_agents_hepi10", "docs/r8_two_agents_hepi10_eval.json"),
            ("HEPi @15M", "docs/runs/r5_two_agents_fix", "docs/runs_two_agents_fix_r5_eval.json"),
            ("HEPi @15M, seed 1", "docs/runs/r8_two_agents_seed2", "docs/r8_two_agents_seed2_eval.json"),
            ("EMPN", "docs/runs/r8_two_agents_empn", "docs/r8_two_agents_empn_eval.json"),
            ("Transformer", "docs/runs/r8_two_agents_transformer", "docs/r8_two_agents_transformer_eval.json"),
        ],
        [-45.0, -32.0],
    ),
]


# Same structure, algorithm swapped instead of the model (HEPi policy for all):
# TRPL vs KL-penalty PPO vs clipped PPO on the flagship task at the flagship
# budget (VERDICT round-2 item 4: capability-grade artifacts for all three
# registered algorithm families, configs/algorithm/{trpl,ppo,kl_ppo}.yaml).
ALGO_GROUPS = [
    (
        "rigid_insertion, HEPi policy (20.48M frames)",
        [
            ("TRPL", "docs/runs/r5_hepi_insertion", "docs/r5_hepi_insertion_eval.json"),
            ("kl_ppo (torchrl)", "docs/runs/r8_kl_ppo_insertion", "docs/r8_kl_ppo_insertion_eval.json"),
            ("kl_ppo FIXED (Schulman β interval)", "docs/runs/r8_kl_ppo_fixed", "docs/r8_kl_ppo_fixed_eval.json"),
            ("PPO (clip)", "docs/runs/r7_ppo_insertion", "docs/r7_ppo_insertion_eval.json"),
        ],
        [-35.0, -30.0, -27.0],
    ),
]


def load_metrics(run_dir):
    for name in ("metrics.jsonl", "metrics_sampled.jsonl"):
        path = os.path.join(REPO, run_dir, name)
        if os.path.exists(path):
            return [json.loads(l) for l in open(path)]
    return None


def frames_to_reward(rows, level):
    for r in rows:
        if r.get("train/reward", -1e30) >= level:
            return r.get("train/frames", r["step"])
    return None


def fmt_frames(f):
    return "—" if f is None else f"{f/1e6:.1f}M"


def build_tables(groups, header_lines, row_kind):
    out = list(header_lines) + [""]
    for title, runs, levels in groups:
        out += [f"## {title}", ""]
        hdr = [row_kind, "success", "min per-shape", "mean final dist"]
        hdr += [f"frames→R≥{lvl:g}" for lvl in levels]
        hdr += ["s/iter"]
        out.append("| " + " | ".join(hdr) + " |")
        out.append("|" + "---|" * len(hdr))
        # first available artifact per base model name wins (rows are listed
        # in priority order, e.g. shipped-code refresh before an older run)
        chosen = {}
        for label, run_dir, eval_json in runs:
            base = label.split(" (")[0]
            ev_path = os.path.join(REPO, eval_json)
            rows = load_metrics(run_dir)
            if base not in chosen and os.path.exists(ev_path) and rows is not None:
                chosen[base] = (label, rows, ev_path)
        for base in dict.fromkeys(l.split(" (")[0] for l, _, _ in runs):
            if base not in chosen:
                out.append(f"| {base} | (run not available) |" + " |" * (len(hdr) - 2))
                continue
            label, rows, ev_path = chosen[base]
            ev = json.load(open(ev_path))
            overall = ev["overall"]
            per_shape = ev.get("per_shape") or {}
            min_shape = (
                min(per_shape.items(), key=lambda kv: kv[1]["success_rate"]) if per_shape else None
            )
            cells = [
                label,
                f"**{overall['success_rate']*100:.2f}%**",
                f"{min_shape[1]['success_rate']*100:.1f}% ({min_shape[0]})" if min_shape else "—",
                f"{overall['mean_final_distance']:.4f}",
            ]
            cells += [fmt_frames(frames_to_reward(rows, lvl)) for lvl in levels]
            iter_times = sorted(r["train/iteration_time"] for r in rows[2:])  # skip compile iters
            # median, not mean: a wedged axon relay mid-run (e.g. the 42-min
            # stall in the r8 kl_ppo run) lands in one iteration's wall time
            # and would inflate a mean ~2x
            med = iter_times[len(iter_times) // 2] if iter_times else 0.0
            cells += [f"{med:.1f}"]
            out.append("| " + " | ".join(cells) + " |")
        out.append("")
    return out


def write(name, lines):
    path = os.path.join(REPO, "docs", name)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")
    print("\n".join(lines))


def main():
    write(
        "MODEL_COMPARISON.md",
        build_tables(
            GROUPS,
            [
                "# HEPi vs baselines — full-budget comparison",
                "",
                "Full-budget training runs at the reference budgets (the paper's",
                "central comparison: equivariant HEPi vs non-equivariant EMPN /",
                "Transformer). Deterministic eval on the best checkpoint; sample",
                "efficiency = first iteration whose mean train reward reaches the",
                "level. All runs: ONE v5e chip, identical algorithm (TRPL) and",
                "task hyperparameters, model swapped.",
            ],
            "model",
        ),
    )
    write(
        "ALGO_COMPARISON.md",
        build_tables(
            ALGO_GROUPS,
            [
                "# Algorithm families — full-budget comparison",
                "",
                "All three registered algorithm families (TRPL, KL-penalty PPO,",
                "clipped PPO — reference configs/algorithm/{trpl,kl_ppo,ppo}.yaml)",
                "trained at the flagship budget with the HEPi policy on",
                "rigid_insertion; deterministic eval on the best checkpoint.",
                "Task/model hyperparameters identical, objective swapped.",
                "",
                "kl_ppo (torchrl) row: the reference's KLPENPPOLoss semantics —",
                "beta adapted multiplicatively on EVERY minibatch loss call —",
                "is a measured relaxation oscillator at flagship scale: episodic",
                "beta ramps to 1e5-1e6 spike the penalty gradient (up to 6.5e4),",
                "poison Adam's second moment, and freeze the policy (ESS=1.0000,",
                "KL=0.0000) for tens of iterations; it parks at the -104 'hover'",
                "shelf and never inserts (0.0% eval). Full instrumented root",
                "cause: docs/KL_PPO_NOTES.md.",
                "",
                "kl_ppo (fixed) row: identical recipe, one-line change —",
                "algorithm.objective.kl_beta_interval=iteration restores",
                "Schulman (2017) semantics (one beta adapt per update phase).",
                "beta then sits at its ~1.0 equilibrium (never leaves [0.5,2]),",
                "KL rides the dtarg band, and the family becomes the most",
                "sample-efficient of the three (reward -30.9 @ 7.0M frames vs",
                "TRPL 10.8M / clip-PPO 11.1M). Caveat: one full-budget run +",
                "two 70-iter probes — treat the efficiency edge as n=1 (the",
                "round-5 seed-2 run was cut by the chip-time clamp; TRPL's own",
                "replicates put insertion seed noise at ~0.2 pp / ~1M frames).",
                "",
                "PPO row: the 20M run hit its wall-clock timeout at 17.3M frames",
                "(train reward -26.9, within noise of TRPL's plateau); eval is",
                "the best checkpoint. Clipped PPO matches TRPL to within 0.3 pp",
                "here — consistent with the reference's framing of TRPL as the",
                "more stable, not necessarily higher-asymptote, choice.",
            ],
            "algorithm",
        ),
    )


if __name__ == "__main__":
    main()
