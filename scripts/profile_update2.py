"""Ablate inside the minibatch grad step: graph build, actor fwd, actor
fwd+bwd, projection on/off, scan unroll variants of the full update."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from geometry_rl_tpu.rl import gaussian as G
from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent

NUM_ENVS, STEPS, MB = 1000, 100, 1000
trainer = build_agent(
    task="rigid_insertion", model="hepi", num_envs=NUM_ENVS, latent_dim=64, num_ori=16,
    train_cfg=TrainConfig(steps_per_batch=STEPS, mini_batch_size=MB, ppo_epochs=5),
    env_kwargs={"warmup_steps": 0}, dtype=jnp.bfloat16,
)
state = trainer.init(jax.random.PRNGKey(0))
collect = jax.jit(lambda s: trainer._collect(s))
_, batch, _ = collect(state)
T, B = STEPS, NUM_ENVS
flat = lambda x: x.reshape((T * B,) + x.shape[2:])
data = {
    "tobs": jtu.tree_map(flat, batch.tobs),
    "action": flat(batch.action), "log_prob": flat(batch.log_prob),
    "mean": flat(batch.mean), "std": flat(batch.std), "value": flat(batch.value),
    "advantage": flat(batch.value), "value_target": flat(batch.value),
    "env_ids": jnp.tile(jnp.arange(B, dtype=jnp.int32), T),
}
mb = jtu.tree_map(lambda x: x[: MB], data)


def bench(fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# 1. graph build only
def _build_arrays(tobs, ids):
    out = trainer.policy_builder.build(tobs, ids)
    return [x for x in jtu.tree_leaves(out) if isinstance(x, jnp.ndarray)]

build_fn = jax.jit(_build_arrays)
print(f"build only:           {bench(build_fn, mb['tobs'], mb['env_ids'])*1e3:6.2f} ms", flush=True)

# 2. actor fwd only
fwd = jax.jit(lambda p, tobs, ids: trainer._policy_dist(p, tobs, ids).mean.sum())
print(f"actor fwd:            {bench(fwd, state.actor_params, mb['tobs'], mb['env_ids'])*1e3:6.2f} ms", flush=True)

# 3. actor fwd+bwd, plain sum loss (no projection/loss math)
g_plain = jax.jit(jax.grad(lambda p, tobs, ids: trainer._policy_dist(p, tobs, ids).mean.astype(jnp.float32).sum()))
print(f"actor fwd+bwd plain:  {bench(g_plain, state.actor_params, mb['tobs'], mb['env_ids'])*1e3:6.2f} ms", flush=True)

# 4. critic fwd+bwd plain
g_critic = jax.jit(jax.grad(lambda p, tobs, ids: trainer._value(p, tobs, ids).astype(jnp.float32).sum()))
print(f"critic fwd+bwd plain: {bench(g_critic, state.critic_params, mb['tobs'], mb['env_ids'])*1e3:6.2f} ms", flush=True)

# 5. full loss grad (actor+critic+projection)
grad_fn = jax.jit(jax.grad(trainer._minibatch_loss, argnums=(0, 1), has_aux=True))
print(f"full loss grad:       {bench(grad_fn, state.actor_params, state.critic_params, mb, state.num_updates, state.initial_entropy)*1e3:6.2f} ms", flush=True)
