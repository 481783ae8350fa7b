import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from geometry_rl_tpu.rl import gaussian as G
from geometry_rl_tpu.rl.obs_pipeline import obs_norm_init, obs_norm_step
from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent

NUM_ENVS, STEPS = 1024, 50
trainer = build_agent(task="rigid_insertion", model="hepi", num_envs=NUM_ENVS,
    latent_dim=64, num_ori=16,
    train_cfg=TrainConfig(steps_per_batch=STEPS, mini_batch_size=1000),
    env_kwargs={"warmup_steps": 0})
env = trainer.env
key = jax.random.PRNGKey(0)
env_state = env.reset(key)
obs = env.observe(env_state)
norm = obs_norm_init(env.obs_spec.group_dim("scalars"))
_, tobs = obs_norm_step(norm, obs, update=False)
params = trainer.policy.init(key, *trainer.policy_builder.build(tobs))

@jax.jit
def env_only(env_state, key):
    def step(carry, _):
        env_state, key = carry
        key, k = jax.random.split(key)
        action = jax.random.uniform(k, (NUM_ENVS, 6), minval=-1, maxval=1)
        env_state, ts = env.step(env_state, action)
        return (env_state, key), ts.reward
    (env_state, key), r = jax.lax.scan(step, (env_state, key), None, length=STEPS)
    return env_state, key, r.sum()

@jax.jit
def policy_only(tobs, key):
    def step(carry, _):
        tobs_c, key = carry
        key, k = jax.random.split(key)
        graph, feats = trainer.policy_builder.build(tobs_c)
        dist = trainer.policy.apply(params, graph, feats)
        a = G.sample(k, dist)
        return (tobs_c, key), a.sum()
    (_, key), s = jax.lax.scan(step, (tobs, key), None, length=STEPS)
    return key, s.sum()

def timeit(f, *args, n=3):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n

t_env = timeit(env_only, env_state, key)
t_pol = timeit(policy_only, tobs, key)
print(f"env-only:    {t_env:.3f}s -> {STEPS*NUM_ENVS/t_env:,.0f} steps/s")
print(f"policy-only: {t_pol:.3f}s -> {STEPS*NUM_ENVS/t_pol:,.0f} steps/s")
