"""End-to-end CLI integration: train -> checkpoints -> play -> eval.json."""

import json
import os

import pytest


def test_train_cli_then_play(tmp_path, monkeypatch):
    from geometry_rl_tpu.train import cli, play

    monkeypatch.chdir(tmp_path)
    cli.main(
        [
            "--config",
            "rigid_insertion_multi_hepi_trpl",
            "--override",
            "env.num_envs=2",
            "env.kwargs.episode_length=4",
            "env.kwargs.warmup_steps=0",
            "collector.frames_per_batch=8",
            "collector.total_frames=24",
            "algorithm.latent_dim=16",
            "algorithm.num_ori=4",
            "algorithm.dtype=float32",
            "algorithm.objective.mini_batch_size=8",
            "algorithm.objective.ppo_epochs=1",
            "logger.checkpoint.save_interval=1",
        ]
    )

    runs = os.listdir(tmp_path / "logs" / "geometry_rl_tpu")
    assert len(runs) == 1
    run_dir = tmp_path / "logs" / "geometry_rl_tpu" / runs[0]
    assert (run_dir / "metrics.jsonl").exists()
    assert (run_dir / "hparams.json").exists()
    assert (run_dir / "checkpoints").is_dir()

    # metrics rows have the reference's key set
    rows = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    assert len(rows) == 3
    for key in ("loss_objective", "loss_critic", "loss_trust_region", "kl", "ESS", "entropy"):
        assert key in rows[0], key

    play.main(["--run-dir", str(run_dir), "--checkpoint", "checkpoints", "--episodes-steps", "8"])
    evals = json.load(open(run_dir / "eval.json"))
    assert len(evals) >= 1
    for v in evals.values():
        assert v["reward"] == v["reward"]  # finite-ish (not NaN) — episodes complete at length 4

    # checkpoint-sweep eval (reference play.py:225-230): EVERY interval save
    # plus the best checkpoint in one eval.json curve, with success rate
    play.main(["--run-dir", str(run_dir), "--all-checkpoints",
               "--episodes-steps", "8", "--success-threshold", "0.1"])
    sweep = json.load(open(run_dir / "eval.json"))
    # 3 iterations at save_interval=1 -> >= 2 interval checkpoints, plus best/*
    assert sum(1 for k in sweep if not k.startswith("best/")) >= 2
    assert any(k.startswith("best/") for k in sweep)
    for v in sweep.values():
        assert "reward" in v
        assert 0.0 <= v["success_rate"] <= 1.0  # rigid insertion exposes distance

    # eval-time recording (reference play.py video path): one GIF per
    # evaluated checkpoint
    play.main(["--run-dir", str(run_dir), "--checkpoint", "best",
               "--episodes-steps", "8", "--record", str(run_dir / "eval_videos")])
    vids = os.listdir(run_dir / "eval_videos")
    # the best/ root can hold several improving saves — one GIF per each
    assert vids and all(v.startswith("best_") and v.endswith(".gif") for v in vids)

    # in-training video recording (reference env.video* keys,
    # orbit/wrappers/torchrl.py:117-123): every `video_interval` iterations a
    # deterministic rollout GIF lands in <run>/<video_dir>
    cli.main(
        [
            "--config",
            "rigid_insertion_multi_hepi_trpl",
            "--override",
            "env.num_envs=2",
            "env.kwargs.episode_length=4",
            "env.kwargs.warmup_steps=0",
            "env.video=true",
            "env.video_interval=2",
            "env.video_length=2",
            "collector.frames_per_batch=8",
            "collector.total_frames=24",
            "algorithm.latent_dim=16",
            "algorithm.num_ori=4",
            "algorithm.dtype=float32",
            "algorithm.objective.mini_batch_size=8",
            "algorithm.objective.ppo_epochs=1",
            "logger.log_dir=logs/video_run",
        ]
    )
    vrun = os.listdir(tmp_path / "logs" / "video_run")[0]
    videos = os.listdir(tmp_path / "logs" / "video_run" / vrun / "videos")
    # 3 iterations, interval 2 -> iters 0 and 2
    assert sorted(videos) == ["iter_00000.gif", "iter_00002.gif"]

    # eval with a DIFFERENT env count than training (the reference's play.py
    # cfg-merge override): env-sized leaves can't restore into the reshaped
    # template, so play partial-restores the env-independent fields
    play.main(["--run-dir", str(run_dir), "--checkpoint", "checkpoints",
               "--episodes-steps", "8", "--num-envs", "4"])
    evals4 = json.load(open(run_dir / "eval.json"))
    assert sorted(evals4) == sorted(evals)
    for v in evals4.values():
        assert v == v
