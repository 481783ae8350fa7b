import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from geometry_rl_tpu.rl import gaussian as G
from geometry_rl_tpu.rl.obs_pipeline import obs_norm_init, obs_norm_step
from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent

NUM_ENVS, STEPS = 1024, 50
for dtype_name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    trainer = build_agent(task="rigid_insertion", model="hepi", num_envs=NUM_ENVS,
        latent_dim=64, num_ori=16,
        train_cfg=TrainConfig(steps_per_batch=STEPS, mini_batch_size=1000),
        env_kwargs={"warmup_steps": 0}, dtype=dtype)
    env = trainer.env
    key = jax.random.PRNGKey(0)
    env_state = env.reset(key)
    obs = env.observe(env_state)
    norm = obs_norm_init(env.obs_spec.group_dim("scalars"))
    _, tobs = obs_norm_step(norm, obs, update=False)
    params = trainer.policy.init(key, *trainer.policy_builder.build(tobs))

    @jax.jit
    def collect(env_state, obs, norm, key):
        def step(carry, _):
            env_state, obs, norm, key = carry
            key, k = jax.random.split(key)
            norm, tobs = obs_norm_step(norm, obs, update=True)
            graph, feats = trainer.policy_builder.build(tobs)
            dist = trainer.policy.apply(params, graph, feats)
            action = G.sample(k, dist)
            env_state, ts = env.step(env_state, action)
            return (env_state, ts.obs, norm, key), ts.reward
        carry, r = jax.lax.scan(step, (env_state, obs, norm, key), None, length=STEPS)
        return carry, r.sum()
    out = collect(env_state, obs, norm, key); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = collect(env_state, obs, norm, key)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/3
    print(f"{dtype_name}: {dt:.3f}s -> {STEPS*NUM_ENVS/dt:,.0f} steps/s", flush=True)
