"""Measure the update-phase HBM levers (VERDICT r2 item 3): compact bf16
LayerNorm and targeted ConvNeXt-MLP remat, on the flagship-scale minibatch
grad step (1000-sample minibatch, rigid_insertion + HEPi)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent

NUM_ENVS, STEPS, MB = 1000, 100, 1000


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


results = {}
for label, kw in [
    ("base", {}),
    ("compact_ln", {"compact_ln": True}),
    ("remat_mlp", {"remat_mlp": True}),
    ("both", {"compact_ln": True, "remat_mlp": True}),
]:
    trainer = build_agent(
        task="rigid_insertion", model="hepi", num_envs=NUM_ENVS, latent_dim=64, num_ori=16,
        train_cfg=TrainConfig(steps_per_batch=STEPS, mini_batch_size=MB, ppo_epochs=5),
        env_kwargs={"warmup_steps": 0}, dtype=jnp.bfloat16, **kw,
    )
    state = trainer.init(jax.random.PRNGKey(0))
    if label == "base":
        _, batch, _ = jax.jit(lambda s: trainer._collect(s))(state)
        T, B = STEPS, NUM_ENVS
        flat = lambda x: x.reshape((T * B,) + x.shape[2:])
        data = {
            "tobs": jtu.tree_map(flat, batch.tobs),
            "action": flat(batch.action), "log_prob": flat(batch.log_prob),
            "mean": flat(batch.mean), "std": flat(batch.std), "value": flat(batch.value),
            "advantage": flat(batch.value), "value_target": flat(batch.value),
            "env_ids": jnp.tile(jnp.arange(B, dtype=jnp.int32), T),
        }
        mb = jtu.tree_map(lambda x: x[:MB], data)

    grad_fn = jax.jit(jax.grad(trainer._minibatch_loss, argnums=(0, 1), has_aux=True))
    ms = bench(grad_fn, state.actor_params, state.critic_params, mb,
               state.num_updates, state.initial_entropy) * 1e3
    results[label] = ms
    print(f"{label:12s} grad step: {ms:6.2f} ms", flush=True)

base = results["base"]
for k, v in results.items():
    print(f"{k:12s} {v:6.2f} ms  ({base / v:.2f}x vs base)")
