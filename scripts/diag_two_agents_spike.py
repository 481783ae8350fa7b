import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Mechanism diagnosis for the two-agents late-training KL spike (VERDICT r2 #1).

Resumes the r4 entropy-control run from checkpoint 140 and re-runs iterations
141..148 (the r4 log spikes at iters 144-146) with per-minibatch
instrumentation: KL(new||old) and KL(new||proj), per-dim sigma/delta-mu of the
worst sample, raw-advantage stats, and actor/critic grad norms. The resume is
deterministic (TrainState carries the PRNG key + num_updates), so the spike
reproduces bit-for-bit modulo XLA fusion differences.

    python scripts/diag_two_agents_spike.py --run-dir docs/runs/r4_two_agents_entctl \
        --start 140 --iters 8 --out docs/diag_two_agents_spike.json
"""

import argparse
import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--hparams-dir", default=None, help="dir holding hparams.json (defaults to --run-dir)")
    ap.add_argument("--start", type=int, default=140)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="docs/diag_two_agents_spike.json")
    args = ap.parse_args()

    from geometry_rl_tpu.config import load_config, trainer_from_config
    from geometry_rl_tpu.rl import gaussian as G
    from geometry_rl_tpu.rl.losses import LossInputs
    from geometry_rl_tpu.rl.obs_pipeline import obs_norm_step
    from geometry_rl_tpu.train.checkpoint import restore_checkpoint

    hp_dir = args.hparams_dir or args.run_dir
    with open(_os.path.join(hp_dir, "hparams.json")) as f:
        cfg = load_config(None, json.load(f))
    trainer = trainer_from_config(cfg)
    env = trainer.env

    state = trainer.init(jax.random.PRNGKey(0))
    state = restore_checkpoint(_os.path.join(args.run_dir, "checkpoints"), state, args.start)
    print(f"restored step {args.start}; num_updates={int(state.num_updates)}")

    cfgt = trainer.cfg
    B = env.cfg.num_envs
    T = cfgt.steps_per_batch
    n_mb = trainer.num_minibatches
    mb_size = trainer.mini_batch_size
    grad_fn = jax.grad(trainer._minibatch_loss, argnums=(0, 1), has_aux=True)

    from geometry_rl_tpu.rl.gae import gae

    @jax.jit
    def diag_update(state, batch):
        _, final_tobs = obs_norm_step(state.norm, state.obs, update=False)
        bootstrap = trainer._value(state.critic_params, final_tobs)
        advantage, value_target = gae(
            batch.reward, batch.value, batch.done.astype(jnp.float32), bootstrap,
            cfgt.gamma, cfgt.gae_lambda,
        )

        def flat(x):
            return x.reshape((T * B,) + x.shape[2:])

        data = {
            "tobs": jax.tree_util.tree_map(flat, batch.tobs),
            "action": flat(batch.action),
            "log_prob": flat(batch.log_prob),
            "mean": flat(batch.mean),
            "std": flat(batch.std),
            "value": flat(batch.value),
            "advantage": flat(advantage),
            "value_target": flat(value_target),
            "env_ids": jnp.tile(jnp.arange(B, dtype=jnp.int32), T),
        }
        N = T * B

        def epoch_fn(carry, _):
            actor_params, critic_params, actor_opt, critic_opt, key, num_updates = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, N)[: n_mb * mb_size].reshape(n_mb, mb_size)

            def mb_fn(carry, idx):
                actor_params, critic_params, actor_opt, critic_opt, num_updates = carry
                mb = jax.tree_util.tree_map(lambda x: x[idx], data)
                # ---- pre-update diagnostics (same forward the loss sees) ----
                dist = trainer._policy_dist(actor_params, mb["tobs"], mb["env_ids"])
                old = G.DiagGaussian(mb["mean"], mb["std"])
                proj = trainer.projection(dist, old, num_updates, initial_entropy=state.initial_entropy)
                mo, co = G.kl_parts(dist, old)
                kl_old = mo + co
                mp, cp = G.kl_parts(dist, proj)
                kl_proj = mp + cp
                iw = jnp.argmax(kl_proj)
                ndiff = (dist.mean - old.mean) / old.std  # [Bmb, A]
                stats = {
                    "kl_old_mean": kl_old.mean(), "kl_old_max": kl_old.max(),
                    "kl_proj_mean": kl_proj.mean(), "kl_proj_max": kl_proj.max(),
                    "mean_kl_old_max": mo.max(), "cov_kl_old_max": co.max(),
                    "worst_maha_per_dim": ndiff[iw] ** 2,
                    "worst_sigma_old": old.std[iw], "worst_sigma_new": dist.std[iw],
                    "worst_dmu": dist.mean[iw] - old.mean[iw],
                    "worst_mu_new": dist.mean[iw], "worst_mu_old": old.mean[iw],
                    "worst_action": mb["action"][iw],
                    "worst_adv": mb["advantage"][iw],
                    "sigma_old_min": old.std.min(), "sigma_old_max": old.std.max(),
                    "sigma_new_min": dist.std.min(), "sigma_new_max": dist.std.max(),
                    "sigma_old_dim_min": old.std.min(axis=0),  # per-dim min over batch
                    "mu_new_absmax": jnp.abs(dist.mean).max(),
                    "adv_absmax": jnp.abs(mb["advantage"]).max(),
                    "adv_std": mb["advantage"].std(),
                    "entropy_new_mean": G.entropy(dist).mean(),
                    "entropy_new_min": G.entropy(dist).min(),
                }
                # ---- the actual update (identical to OnPolicyTrainer._update) ----
                (g_actor, g_critic), (metrics, _) = grad_fn(
                    actor_params, critic_params, mb, num_updates, state.initial_entropy, None
                )
                stats["grad_norm_actor"] = optax.global_norm(g_actor)
                stats["grad_norm_critic"] = optax.global_norm(g_critic)
                a_up, actor_opt = trainer.actor_tx.update(g_actor, actor_opt, actor_params)
                c_up, critic_opt = trainer.critic_tx.update(g_critic, critic_opt, critic_params)
                stats["update_norm_actor"] = optax.global_norm(a_up)
                actor_params = optax.apply_updates(actor_params, a_up)
                critic_params = optax.apply_updates(critic_params, c_up)
                stats["loss_kl_metric"] = metrics["kl"]
                stats["loss_tr"] = metrics["loss_trust_region"]
                return (actor_params, critic_params, actor_opt, critic_opt, num_updates + 1), stats

            (actor_params, critic_params, actor_opt, critic_opt, num_updates), stats = jax.lax.scan(
                mb_fn, (actor_params, critic_params, actor_opt, critic_opt, num_updates), perm
            )
            return (actor_params, critic_params, actor_opt, critic_opt, key, num_updates), stats

        carry0 = (state.actor_params, state.critic_params, state.actor_opt,
                  state.critic_opt, state.key, state.num_updates)
        (actor_params, critic_params, actor_opt, critic_opt, key, num_updates), stats = jax.lax.scan(
            epoch_fn, carry0, None, length=cfgt.ppo_epochs
        )
        new_state = state._replace(
            actor_params=actor_params, critic_params=critic_params,
            actor_opt=actor_opt, critic_opt=critic_opt, key=key, num_updates=num_updates,
        )
        return new_state, stats

    collect_jit = jax.jit(trainer._collect)

    out = {"start": args.start, "iterations": []}
    for it in range(args.start + 1, args.start + 1 + args.iters):
        state, batch, collect_stats = collect_jit(state)
        state, stats = diag_update(state, batch)
        stats = jax.tree_util.tree_map(np.asarray, stats)
        # flatten [E, M, ...] -> [E*M, ...]
        stats = {k: v.reshape((-1,) + v.shape[2:]) for k, v in stats.items()}
        kmax = stats["kl_proj_max"]
        w = int(np.argmax(kmax))
        rec = {
            "iter": it,
            "reward": float(np.asarray(collect_stats["train/reward"])),
            "kl_proj_max_over_mbs": float(kmax.max()),
            "kl_proj_mean_of_means": float(stats["kl_proj_mean"].mean()),
            "kl_old_max_over_mbs": float(stats["kl_old_max"].max()),
            "n_mbs_kl_gt_0.1": int((kmax > 0.1).sum()),
            "n_mbs_kl_gt_1": int((kmax > 1.0).sum()),
            "sigma_old_min": float(stats["sigma_old_min"].min()),
            "sigma_new_min": float(stats["sigma_new_min"].min()),
            "mu_new_absmax": float(stats["mu_new_absmax"].max()),
            "adv_absmax": float(stats["adv_absmax"].max()),
            "grad_norm_actor_max": float(stats["grad_norm_actor"].max()),
            "grad_norm_actor_median": float(np.median(stats["grad_norm_actor"])),
            "update_norm_actor_max": float(stats["update_norm_actor"].max()),
            "entropy_new_mean_last": float(stats["entropy_new_mean"][-1]),
            "entropy_new_min": float(stats["entropy_new_min"].min()),
            "worst_mb": {
                "mb_index": w,
                "kl_proj_max": float(kmax[w]),
                "kl_old_max": float(stats["kl_old_max"][w]),
                "mean_kl_old_max": float(stats["mean_kl_old_max"][w]),
                "cov_kl_old_max": float(stats["cov_kl_old_max"][w]),
                "maha_per_dim": stats["worst_maha_per_dim"][w].tolist(),
                "sigma_old": stats["worst_sigma_old"][w].tolist(),
                "sigma_new": stats["worst_sigma_new"][w].tolist(),
                "dmu": stats["worst_dmu"][w].tolist(),
                "mu_new": stats["worst_mu_new"][w].tolist(),
                "mu_old": stats["worst_mu_old"][w].tolist(),
                "action": stats["worst_action"][w].tolist(),
                "adv": float(stats["worst_adv"][w]),
                "sigma_old_dim_min": stats["sigma_old_dim_min"][w].tolist(),
                "adv_absmax": float(stats["adv_absmax"][w]),
                "grad_norm_actor": float(stats["grad_norm_actor"][w]),
                "update_norm_actor": float(stats["update_norm_actor"][w]),
            },
            # trajectory of per-mb max KL, subsampled for the report
            "kl_proj_max_per_mb_head": kmax[:25].tolist(),
            "kl_proj_max_per_mb_p99": float(np.percentile(kmax, 99)),
        }
        out["iterations"].append(rec)
        print(json.dumps({k: rec[k] for k in ("iter", "kl_proj_max_over_mbs", "sigma_old_min",
                                              "mu_new_absmax", "grad_norm_actor_max",
                                              "adv_absmax", "entropy_new_min")}))
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
