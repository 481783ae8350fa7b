"""Unit tests for the post-hoc analysis scripts (threshold sweep, seed
aggregation) — the tools that convert --save-distances eval artifacts into
the docs tables, so their math must not drift."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_threshold_sweep_math(tmp_path):
    from threshold_sweep import sweep

    # 10 episodes, 2 shapes: A at distances 0.05 (always in), B at 0.11
    # (in only at threshold >= 0.12)
    ev = {
        "overall": {"episodes": 10},
        "per_shape": {},
        "final_distances": [0.05] * 5 + [0.11] * 5,
        "final_shapes": ["A"] * 5 + ["B"] * 5,
    }
    p = tmp_path / "x_eval.json"
    p.write_text(json.dumps(ev))
    rep = sweep(str(p))
    assert rep["overall"]["0.10"] == 0.5
    assert rep["overall"]["0.12"] == 1.0
    assert rep["per_shape"]["A"]["success"]["0.10"] == 1.0
    assert rep["per_shape"]["B"]["success"]["0.10"] == 0.0
    assert rep["per_shape"]["B"]["success"]["0.12"] == 1.0
    assert rep["per_shape"]["B"]["p50"] == 0.11


def test_threshold_sweep_requires_distances(tmp_path):
    p = tmp_path / "y_eval.json"
    p.write_text(json.dumps({"overall": {}}))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "threshold_sweep.py"), str(p)],
        capture_output=True,
        text=True,
    )
    assert r.returncode != 0
    assert "save-distances" in r.stderr


def test_seed_table_aggregates(tmp_path, monkeypatch):
    evs = []
    for i, (s, d) in enumerate([(0.90, 0.05), (0.95, 0.04), (0.85, 0.06)]):
        p = tmp_path / f"seed{i}_eval.json"
        p.write_text(
            json.dumps({"overall": {"success_rate": s, "mean_final_distance": d}})
        )
        evs.append(str(p))
    monkeypatch.chdir(tmp_path)
    os.makedirs("docs", exist_ok=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "seed_table.py"), "demo", *evs],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    rep = json.load(open("docs/seeds_demo.json"))
    assert rep["seeds"] == 3
    assert rep["success"]["mean"] == round((0.90 + 0.95 + 0.85) / 3, 4)
    assert rep["success"]["min"] == 0.85 and rep["success"]["max"] == 0.95
    # n=3: IQM trims floor(3/4)=0 from each side -> equals the mean
    assert rep["success"]["iqm"] == rep["success"]["mean"]
    np.testing.assert_allclose(rep["mean_final_distance"]["mean"], 0.05)
