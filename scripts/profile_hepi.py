import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
from functools import partial

import jax
import jax.numpy as jnp

from geometry_rl_tpu.rl.obs_pipeline import obs_norm_init, obs_norm_step
from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent
from geometry_rl_tpu.models import common as mcommon
from geometry_rl_tpu.models import ponita as mponita

NUM_ENVS = 1024
trainer = build_agent(
    task="rigid_insertion", model="hepi", num_envs=NUM_ENVS, latent_dim=64, num_ori=16,
    train_cfg=TrainConfig(steps_per_batch=4, mini_batch_size=1000),
    env_kwargs={"warmup_steps": 0}, dtype=jnp.bfloat16,
)
env = trainer.env
key = jax.random.PRNGKey(0)
env_state = env.reset(key)
obs = env.observe(env_state)
norm = obs_norm_init(env.obs_spec.group_dim("scalars"))
_, tobs = obs_norm_step(norm, obs, update=False)
graph, feats = trainer.policy_builder.build(tobs)
params = trainer.policy.init(key, graph, feats)


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


@jax.jit
def fwd(params):
    d = trainer.policy.apply(params, graph, feats)
    return d.mean.sum() + d.std.sum()


print(f"full fwd           : {timeit(fwd, params):.2f} ms", flush=True)

# scatter-free variant: monkeypatch scatter_sum to a dense mean (wrong math,
# same data volume minus scatter)
orig_scatter = mcommon.scatter_sum


def fake_scatter(messages, dst, num_nodes):
    s = messages.sum(axis=1, keepdims=True)
    return jnp.broadcast_to(s, (messages.shape[0], num_nodes) + messages.shape[2:])


mponita.scatter_sum = fake_scatter


@jax.jit
def fwd_noscatter(params):
    d = trainer.policy.apply(params, graph, feats)
    return d.mean.sum() + d.std.sum()


print(f"no-scatter fwd     : {timeit(fwd_noscatter, params):.2f} ms", flush=True)
mponita.scatter_sum = orig_scatter

# gather-free too
orig_gather = mponita.gather_nodes


def fake_gather(x, idx):
    return jnp.broadcast_to(x[:, :1], (x.shape[0], idx.shape[1]) + x.shape[2:])


mponita.gather_nodes = fake_gather
mponita.scatter_sum = fake_scatter


@jax.jit
def fwd_nogs(params):
    d = trainer.policy.apply(params, graph, feats)
    return d.mean.sum() + d.std.sum()


print(f"no-gather/scatter  : {timeit(fwd_nogs, params):.2f} ms", flush=True)
mponita.gather_nodes = orig_gather
mponita.scatter_sum = orig_scatter

# basis-free: constant bases
import geometry_rl_tpu.models.hepi as mhepi

orig_basis = mponita.PolynomialBasis


class ConstBasis(orig_basis):
    @property
    def _dummy(self):
        return None

    def __call__(self, x):
        shape = x.shape[:-1] + (self.basis_dim,)
        return jnp.ones(shape, self.dtype)


mhepi.PolynomialBasis = ConstBasis


@jax.jit
def fwd_nobasis(params):
    d = trainer.policy.apply(params, graph, feats)
    return d.mean.sum() + d.std.sum()


print(f"const-basis fwd    : {timeit(fwd_nobasis, params):.2f} ms", flush=True)
mhepi.PolynomialBasis = orig_basis


@jax.jit
def fwd_bwd(params):
    def loss(p):
        d = trainer.policy.apply(p, graph, feats)
        return d.mean.sum() + d.std.sum()
    g = jax.grad(loss)(params)
    return jax.tree_util.tree_reduce(lambda a, b: a + b.sum(), g, 0.0)


print(f"fwd+bwd            : {timeit(fwd_bwd, params):.2f} ms", flush=True)
