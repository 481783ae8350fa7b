"""Smoke tests for the deploy scripts' --dry-run / DRY_RUN=1 modes.

The scripts themselves can't execute here (no SLURM daemon, no gcloud, no
pod), but their argument handling, flag composition and usage errors are
testable: dry-run prints the exact command that would run (VERDICT r2
"keep them smoke-testable so CI can at least parse/flag-check them")."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **env):
    return subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True,
        env={**os.environ, **{k: str(v) for k, v in env.items()}},
    )


def test_launch_tpu_dry_run():
    r = run(["bash", "deploy/launch_tpu.sh", "--dry-run",
             "rigid_insertion_multi_hepi_trpl", "env.num_envs=8", "seed=3"])
    assert r.returncode == 0, r.stderr
    out = r.stdout.strip()
    assert out.startswith("DRY-RUN: python -m geometry_rl_tpu.train.cli")
    assert "--config rigid_insertion_multi_hepi_trpl" in out
    assert "--override env.num_envs=8 seed=3" in out


def test_launch_tpu_dry_run_env_var_and_no_overrides():
    r = run(["bash", "deploy/launch_tpu.sh", "cloth_hanging_multi_hepi_trpl"], DRY_RUN=1)
    assert r.returncode == 0, r.stderr
    assert "--override" not in r.stdout  # no empty --override tail


def test_launch_tpu_usage_error():
    r = run(["bash", "deploy/launch_tpu.sh", "--dry-run"])
    assert r.returncode != 0
    assert "usage" in r.stderr


def test_launch_pod_dry_run():
    r = run(["bash", "deploy/launch_pod.sh", "--dry-run", "my-pod", "us-east5-a",
             "rigid_insertion_multi_hepi_trpl", "env.num_envs=4096"])
    assert r.returncode == 0, r.stderr
    out = r.stdout.strip()
    assert out.startswith("DRY-RUN: gcloud compute tpus tpu-vm ssh my-pod")
    assert "--zone us-east5-a" in out
    assert "--worker=all" in out
    assert "GEOMRL_MULTIHOST=1" in out
    assert "--override env.num_envs=4096" in out


def test_launch_pod_usage_error():
    r = run(["bash", "deploy/launch_pod.sh", "--dry-run", "only-name"])
    assert r.returncode != 0
    assert "zone" in r.stderr


def test_slurm_job_dry_run():
    r = run(["bash", "deploy/slurm_job.sbatch", "rope_closing_hepi_trpl"],
            DRY_RUN=1, SLURM_ARRAY_TASK_ID=7,
            EXTRA_OVERRIDES="collector.total_frames=1000")
    assert r.returncode == 0, r.stderr
    out = r.stdout.strip()
    assert "--config rope_closing_hepi_trpl" in out
    assert "seed=7" in out
    assert "logs/geometry_rl_tpu/rope_closing_hepi_trpl_seed7" in out
    assert "collector.total_frames=1000" in out


def test_slurm_job_default_seed():
    r = run(["bash", "deploy/slurm_job.sbatch", "rope_closing_hepi_trpl"], DRY_RUN=1)
    assert r.returncode == 0, r.stderr
    assert "seed=0" in r.stdout


@pytest.mark.parametrize("script", ["launch_tpu.sh", "launch_pod.sh", "slurm_job.sbatch"])
def test_bash_syntax(script):
    r = run(["bash", "-n", os.path.join("deploy", script)])
    assert r.returncode == 0, r.stderr
