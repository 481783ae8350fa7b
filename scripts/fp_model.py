"""Policy-forward fingerprint across binaries (cloth adjudication, round 5).

Builds the EXACT flagship trainer (cloth_hanging + HEPi + TRPL) via
trainer_from_config, runs trainer.init(seed) and one policy forward on the
reset observation, and prints high-precision fingerprints of the init
params and the output distribution. Run under the d2c44f2 worktree and
HEAD on the same backend; a difference here (with bit-identical env
fingerprints from fp_env.py) pins the same-seed divergence to the model
forward's float rounding on that backend.

Usage: python scripts/fp_model.py [--envs 8] [--platform cpu|default]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--platform" in sys.argv:
    _plat = sys.argv[sys.argv.index("--platform") + 1]
else:
    _plat = "cpu"
if _plat != "default":
    jax.config.update("jax_platforms", _plat)

import numpy as np


def fp(name, arr):
    a = np.asarray(jax.device_get(arr), dtype=np.float64)
    print(
        f"FP {name}: sum={a.sum():.10e} abs={np.abs(a).sum():.10e} "
        f"min={a.min():.10e} max={a.max():.10e} shape={a.shape}"
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="cpu")
    p.add_argument(
        "--dtype",
        default="config",
        help="override algorithm.dtype (e.g. float32 for a high-precision "
        "reference to measure each binary's bf16 forward error against)",
    )
    args = p.parse_args()
    print("backend:", jax.default_backend())

    from geometry_rl_tpu.config import load_config, trainer_from_config
    from geometry_rl_tpu.rl.obs_pipeline import obs_norm_apply

    overrides = {"env": {"num_envs": args.envs}}
    if args.dtype != "config":
        overrides["algorithm"] = {"dtype": args.dtype}
    cfg = load_config("cloth_hanging_multi_hepi_trpl", overrides)
    print("dtype:", cfg["algorithm"]["dtype"])
    trainer = trainer_from_config(cfg)
    state = trainer.init(jax.random.PRNGKey(args.seed))

    leaves = jax.tree_util.tree_leaves(state.actor_params)
    print("actor param leaves:", len(leaves), "total size:", sum(l.size for l in leaves))
    fp("actor_params.abssum", np.concatenate([np.abs(np.asarray(jax.device_get(l), np.float64)).ravel() for l in leaves]))

    tobs = obs_norm_apply(state.norm, state.obs)
    dist = jax.jit(trainer._policy_dist)(state.actor_params, tobs)
    fp("dist.mean", dist.mean)
    fp("dist.std", dist.std)
    print("DONE")


if __name__ == "__main__":
    main()
