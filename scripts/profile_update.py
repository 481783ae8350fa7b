"""Break down train_iteration wall time: collection vs GAE vs update epochs,
plus a single minibatch grad step, at flagship rigid_insertion config.

Run on TPU (no pin) while nothing else is using the chip.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent

NUM_ENVS = 1000
STEPS = 100  # frames_per_batch / num_envs
MB = 1000

trainer = build_agent(
    task="rigid_insertion",
    model="hepi",
    num_envs=NUM_ENVS,
    latent_dim=64,
    num_ori=16,
    train_cfg=TrainConfig(steps_per_batch=STEPS, mini_batch_size=MB, ppo_epochs=5),
    env_kwargs={"warmup_steps": 0},
    dtype=jnp.bfloat16,
)
state = trainer.init(jax.random.PRNGKey(0))


def bench(fn, *args, n=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


# full iteration
dt_full, (state2, _) = bench(trainer.train_iteration, state)
print(f"train_iteration: {dt_full*1e3:.1f} ms", flush=True)

# collection only
collect = jax.jit(lambda s: trainer._collect(s))
dt_col, (_, batch, _) = bench(collect, state)
print(f"collect only:    {dt_col*1e3:.1f} ms", flush=True)

# update only (collection replayed from fixed batch)
update = jax.jit(lambda s, b: trainer._update(s, b))
dt_upd, _ = bench(update, state, batch)
print(f"update only:     {dt_upd*1e3:.1f} ms  ({trainer.cfg.ppo_epochs} epochs x {trainer.num_minibatches} mb)", flush=True)
per_step = dt_upd / (trainer.cfg.ppo_epochs * trainer.num_minibatches)
print(f"per grad step:   {per_step*1e3:.2f} ms", flush=True)

# single grad step in isolation (same minibatch every time)
import jax.tree_util as jtu

T, B = STEPS, NUM_ENVS


def flat(x):
    return x.reshape((T * B,) + x.shape[2:])

data = {
    "tobs": jtu.tree_map(flat, batch.tobs),
    "action": flat(batch.action),
    "log_prob": flat(batch.log_prob),
    "mean": flat(batch.mean),
    "std": flat(batch.std),
    "value": flat(batch.value),
    "advantage": flat(batch.value),  # placeholder, shape-correct
    "value_target": flat(batch.value),
    "env_ids": jnp.tile(jnp.arange(B, dtype=jnp.int32), T),
}
idx = jnp.arange(MB)
mb = jtu.tree_map(lambda x: x[idx], data)

grad_fn = jax.jit(jax.grad(trainer._minibatch_loss, argnums=(0, 1), has_aux=True))
dt_g, _ = bench(grad_fn, state.actor_params, state.critic_params, mb, state.num_updates, state.initial_entropy, n=10)
print(f"isolated fwd+bwd (actor+critic, mb={MB}): {dt_g*1e3:.2f} ms", flush=True)

# actor-only and critic-only grads
actor_loss = lambda ap, mb, nu: trainer._minibatch_loss(ap, state.critic_params, mb, nu, state.initial_entropy)[0]
ga = jax.jit(jax.grad(actor_loss))
dt_a, _ = bench(ga, state.actor_params, mb, state.num_updates, n=10)
print(f"actor grad only: {dt_a*1e3:.2f} ms", flush=True)

# compiled-program flops for one grad step
lowered = jax.jit(jax.grad(trainer._minibatch_loss, argnums=(0, 1), has_aux=True)).lower(
    state.actor_params, state.critic_params, mb, state.num_updates, state.initial_entropy
)
try:
    cost = lowered.compile().cost_analysis()
    fl = cost.get("flops", float("nan")) if isinstance(cost, dict) else cost[0].get("flops", float("nan"))
    print(f"grad-step flops: {fl:.3e} -> {fl/dt_g/1e12:.3f} TFLOP/s achieved", flush=True)
except Exception as e:  # pragma: no cover
    print("cost analysis unavailable:", e, flush=True)
