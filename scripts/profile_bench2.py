import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from geometry_rl_tpu.rl import gaussian as G
from geometry_rl_tpu.rl.obs_pipeline import obs_norm_init, obs_norm_step
from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent

NUM_ENVS, STEPS = 1024, 50
trainer = build_agent(
    task="rigid_insertion",
    model="hepi",
    num_envs=NUM_ENVS,
    latent_dim=64,
    num_ori=16,
    train_cfg=TrainConfig(steps_per_batch=STEPS, mini_batch_size=1000),
    env_kwargs={"warmup_steps": 0},
)
env = trainer.env
key = jax.random.PRNGKey(0)
env_state = env.reset(key)
obs = env.observe(env_state)
norm = obs_norm_init(env.obs_spec.group_dim("scalars"))
_, tobs0 = obs_norm_step(norm, obs, update=False)
params = trainer.policy.init(key, *trainer.policy_builder.build(tobs0))


def make_collect(with_norm, with_policy, with_env):
    @jax.jit
    def collect(env_state, obs, norm, key):
        def step(carry, _):
            env_state, obs, norm, key = carry
            key, k = jax.random.split(key)
            if with_norm:
                norm, tobs = obs_norm_step(norm, obs, update=True)
            else:
                tobs = tobs0
            if with_policy:
                graph, feats = trainer.policy_builder.build(tobs)
                dist = trainer.policy.apply(params, graph, feats)
                action = G.sample(k, dist)
                lp = G.log_prob(dist, action)
            else:
                action = jax.random.uniform(k, (NUM_ENVS, 6), minval=-1, maxval=1)
                lp = action.sum(-1)
            if with_env:
                env_state, ts = env.step(env_state, action)
                obs = ts.obs
                r = ts.reward
            else:
                r = action.sum(-1)
            return (env_state, obs, norm, key), (r, lp)

        carry, (r, lp) = jax.lax.scan(step, (env_state, obs, norm, key), None, length=STEPS)
        return carry, r.sum() + lp.sum()

    return collect


def timeit(f, n=3):
    out = f(env_state, obs, norm, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(env_state, obs, norm, key)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


for name, flags in [
    ("env only         ", (False, False, True)),
    ("norm+env         ", (True, False, True)),
    ("norm+policy      ", (True, True, False)),
    ("norm+policy+env  ", (True, True, True)),
]:
    t = timeit(make_collect(*flags))
    print(f"{name}: {t:.3f}s -> {STEPS*NUM_ENVS/t:,.0f} steps/s", flush=True)
