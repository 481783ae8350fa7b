"""Census of large-tensor dtypes in the compiled minibatch grad step HLO.

Finds f32 tensors of edge-space scale that should be bf16 (VERDICT r2 item 3:
"bf16 edge-space message tensors end-to-end in the update").
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import collections
import re

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

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
mb = jtu.tree_map(lambda x: x[:MB], data)

grad_fn = jax.jit(jax.grad(trainer._minibatch_loss, argnums=(0, 1), has_aux=True))
txt = grad_fn.lower(state.actor_params, state.critic_params, mb,
                    state.num_updates, state.initial_entropy).compile().as_text()

# tally output-tensor bytes per (dtype, op kind) for tensors >= 1 MB
pat = re.compile(r"^\s*(?:ROOT )?%?[\w.\-]+ = (f32|bf16|f16|s32|pred|u32)\[([\d,]*)\][^ ]* (\w+)")
DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1}
tally = collections.Counter()
examples = {}
for line in txt.splitlines():
    m = pat.match(line)
    if not m:
        continue
    dt, shape, op = m.group(1), m.group(2), m.group(3)
    if op in ("parameter", "constant", "tuple", "get"):
        continue
    n = 1
    for d in shape.split(","):
        if d:
            n *= int(d)
    bytes_ = n * DT_BYTES[dt]
    if bytes_ < 1 << 20:
        continue
    key = (dt, op)
    tally[key] += bytes_
    if key not in examples or bytes_ > examples[key][0]:
        examples[key] = (bytes_, line.strip()[:160])

print(f"{'dtype':>5} {'op':<22} {'total MB':>9}  largest-instance example")
for (dt, op), b in tally.most_common(30):
    print(f"{dt:>5} {op:<22} {b/(1<<20):9.1f}  {examples[(dt,op)][1][:120]}")
