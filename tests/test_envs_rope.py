"""Rope environment + graph builder + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.envs import make_env
from geometry_rl_tpu.envs.rope import shape_descriptor, w_shape_curve
from geometry_rl_tpu.graphs.rope import RopeGraphBuilder
from geometry_rl_tpu.rl.obs_pipeline import obs_norm_apply, obs_norm_init
from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent

B = 4


def test_w_shape_curve_properties():
    pts = w_shape_curve(80, 10.0)
    assert pts.shape == (80, 3)
    # arc length ~ rope length
    seg = np.linalg.norm(np.diff(pts[:, :2], axis=0), axis=1)
    np.testing.assert_allclose(seg.sum(), 10.0, rtol=0.02)
    # it is a W: y has multiple local minima (at least 2 dips)
    y = pts[:, 1]
    dips = ((y[1:-1] < y[:-2]) & (y[1:-1] < y[2:])).sum()
    assert dips >= 2


def test_load_target_curve_formats(tmp_path):
    """load_target_curve reproduces the reference LASA pipeline
    (observations.py:26-60): index-space interp to num_links, total polyline
    length scaled to rope_length, constant z — from .mat (pyLasaDataset
    layout), .npy, and .csv."""
    from geometry_rl_tpu.envs.rope import load_target_curve

    # synthetic trace (a sine 'W'-ish curve), [2, T] like LASA demo pos
    t = np.linspace(0, 2 * np.pi, 500)
    trace = np.stack([t * 10.0, 12.0 * np.sin(2 * t)], axis=0)

    # pyLasaDataset .mat layout: demos = [1, D] cell of structs w/ field pos
    import scipy.io

    demo = np.zeros((1, 1), dtype=[("pos", object), ("t", object)])
    demo["pos"][0, 0] = trace
    demo["t"][0, 0] = t[None]
    cell = np.zeros((1, 3), dtype=object)
    for d in range(3):
        cell[0, d] = demo
    scipy.io.savemat(tmp_path / "WShape.mat", {"demos": cell})

    np.save(tmp_path / "curve.npy", trace)
    np.savetxt(tmp_path / "curve.csv", trace.T, delimiter=",")

    out_mat = load_target_curve(str(tmp_path / "WShape.mat"), 80, 10.0)
    out_npy = load_target_curve(str(tmp_path / "curve.npy"), 80, 10.0)
    out_csv = load_target_curve(str(tmp_path / "curve.csv"), 80, 10.0)
    for out in (out_mat, out_npy, out_csv):
        assert out.shape == (80, 3)
        # total length == rope_length exactly (the reference's scale step)
        seg = np.linalg.norm(np.diff(out[:, :2], axis=0), axis=1)
        np.testing.assert_allclose(seg.sum(), 10.0, rtol=1e-5)
        np.testing.assert_allclose(out[:, 2], 0.1, atol=1e-7)
    np.testing.assert_allclose(out_mat, out_npy, atol=1e-6)
    np.testing.assert_allclose(out_mat, out_csv, atol=1e-5)

    # reference math cross-check: index-space interpolation, NOT arc-length
    interp_points = np.linspace(0, trace.shape[1] - 1, 80)
    x = np.interp(interp_points, np.arange(trace.shape[1]), trace[0])
    y = np.interp(interp_points, np.arange(trace.shape[1]), trace[1])
    ref = np.stack([x, y], axis=1)
    ref *= 10.0 / np.linalg.norm(np.diff(ref, axis=0), axis=1).sum()
    np.testing.assert_allclose(out_npy[:, :2], ref, atol=1e-5)


def test_rope_shaping_env_with_target_curve_file(tmp_path):
    """env.kwargs.target_curve_file swaps the procedural W for file data."""
    t = np.linspace(0, 2 * np.pi, 300)
    np.save(tmp_path / "c.npy", np.stack([t, np.sin(3 * t)], axis=0))
    env = make_env(
        "rope_shaping", num_envs=2, num_links=20, rope_length=2.5,
        target_curve_file=str(tmp_path / "c.npy"),
    )
    assert env.target_curve.shape == (20, 3)
    # centered in xy (env placement convention, like w_shape_curve)
    np.testing.assert_allclose(np.asarray(env.target_curve[:, :2]).mean(0), 0.0, atol=1e-5)
    state = env.reset(jax.random.PRNGKey(0))
    state, ts = env.step(state, jnp.zeros((2, env.cfg.action_dim)))
    assert np.isfinite(np.asarray(ts.reward)).all()


def test_shape_descriptor_invariances():
    pts = jnp.asarray(w_shape_curve(20, 5.0)[:, :2])
    d0 = shape_descriptor(pts)
    # translation invariant? relative vectors are midpoint-relative -> yes
    d1 = shape_descriptor(pts + jnp.asarray([3.0, -2.0]))
    np.testing.assert_allclose(d0, d1, atol=1e-4)
    # scaling changes it
    d2 = shape_descriptor(pts * 2.0)
    assert float(jnp.abs(d2 - d0).max()) > 0.1


def test_rope_closing_env_steps():
    env = make_env("rope_closing", num_envs=B)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.scene.particles.pos.shape == (B, 40, 3)
    state, ts = env.step(state, jnp.zeros((B, env.cfg.action_dim)))
    assert np.isfinite(np.asarray(ts.reward)).all()
    for g in ("scalars", "position_vectors", "velocity_vectors"):
        assert ts.obs[g].shape == (B, env.obs_spec.group_dim(g))


def test_rope_ends_attached_to_grippers():
    env = make_env("rope_closing", num_envs=B)
    state = env.reset(jax.random.PRNGKey(1))
    # drive gripper 0 and check link 0 follows
    action = jnp.zeros((B, 6)).at[:, 0].set(1.0)
    for _ in range(20):
        state, _ = env.step(state, action)
        state = state._replace(episode_step=jnp.zeros_like(state.episode_step))
    d0 = np.linalg.norm(
        np.asarray(state.scene.particles.pos[:, 0] - state.scene.bodies.pos[:, 0]), axis=-1
    )
    assert (d0 < 0.05).all()
    # rope segment lengths stay near rest
    seg = np.linalg.norm(np.diff(np.asarray(state.scene.particles.pos), axis=1), axis=-1)
    assert seg.max() < env.cfg.link_spacing * 1.6


def test_rope_pole_collision():
    """Links cannot penetrate the hanger pole."""
    env = make_env("rope_closing", num_envs=B)
    state = env.reset(jax.random.PRNGKey(2))
    # drag both grippers toward/past the hanger
    for _ in range(60):
        hanger = jnp.concatenate([state.hanger_xy, jnp.full((B, 1), env.cfg.rope_z)], axis=-1)
        a = jnp.zeros((B, 6))
        for i in range(2):
            d = hanger - state.scene.bodies.pos[:, i]
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
            a = a.at[:, 3 * i : 3 * i + 3].set(d)
        state, _ = env.step(state, a)
        state = state._replace(episode_step=jnp.zeros_like(state.episode_step))
    dist = np.linalg.norm(
        np.asarray(state.scene.particles.pos[..., :2]) - np.asarray(state.hanger_xy)[:, None], axis=-1
    )
    assert dist.min() > env.cfg.hanger_radius * 0.8, dist.min()


def test_rope_shaping_env():
    env = make_env("rope_shaping", num_envs=B)
    state = env.reset(jax.random.PRNGKey(3))
    assert state.scene.particles.pos.shape == (B, 80, 3)
    state, ts = env.step(state, jnp.zeros((B, 6)))
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert (np.asarray(ts.reward) <= 0).all()


def test_rope_graph_builder():
    env = make_env("rope_closing", num_envs=B)
    state = env.reset(jax.random.PRNGKey(4))
    obs = env.observe(state)
    norm = obs_norm_init(env.obs_spec.group_dim("scalars"))
    tobs = obs_norm_apply(norm, obs)
    builder = RopeGraphBuilder.from_env(env, dist_as_pos=True)
    graph, feats = builder.build(tobs)
    assert set(graph.nodes) == {"links", "grippers", "target_geometry"}
    assert feats.vectors["links"].shape == (B, 40, 3, 3)
    # internal edges connect chain neighbors
    src = np.asarray(builder.internal_src)
    dst = np.asarray(builder.internal_dst)
    assert (np.abs(src - dst) <= 3).all() and (src != dst).all()


def test_rope_trainer_end_to_end():
    trainer = build_agent(
        task="rope_closing",
        model="hepi",
        num_envs=2,
        algo="trpl",
        latent_dim=16,
        num_ori=4,
        train_cfg=TrainConfig(algo="trpl", steps_per_batch=4, ppo_epochs=1, mini_batch_size=8),
        env_kwargs={"episode_length": 4, "num_links": 10, "rope_length": 1.25},
    )
    state = trainer.init(jax.random.PRNGKey(0))
    state, metrics = trainer.train_iteration(state)
    assert np.isfinite(float(metrics["loss_objective"]))
    assert np.isfinite(float(metrics["loss_critic"]))


def test_object_target_distance_info():
    import numpy as np

    for task, kw in [("rope_closing", {}), ("rope_shaping", {"num_links": 10, "rope_length": 1.25})]:
        env = make_env(task, num_envs=B, episode_length=8, **kw)
        state = env.reset(jax.random.PRNGKey(0))
        state, ts = env.step(state, jnp.zeros((B, env.cfg.action_dim)))
        d = np.asarray(ts.info["object_target_distance"])
        assert d.shape == (B,), task
        assert np.isfinite(d).all(), task


def test_rope_action_term_parity():
    """Reference rope CubeActionTerm: 3-dim per cube, clamp(+-1)*5.0, z zeroed
    (rope_tasks/mdp/actions.py:31-72)."""
    env = make_env("rope_closing", num_envs=2)
    assert env.cfg.action_dim == 6  # 2 grippers x 3
    state = env.reset(jax.random.PRNGKey(0))
    a = jnp.asarray([[2.0, 0.0, 1.0, 0.0, -3.0, 0.0]] * 2)  # over-limit values
    scene = env._apply_action(state.scene, a)
    v = np.asarray(scene.bodies.lin_vel)
    np.testing.assert_allclose(v[:, 0], [[5.0, 0.0, 0.0]] * 2)  # clamped*5, z=0
    np.testing.assert_allclose(v[:, 1], [[0.0, -5.0, 0.0]] * 2)


def test_rope_material_cfg_plumbs_into_contacts():
    """restitution / dynamic_friction_scale reach both particle contacts with
    each contact's own static coefficient as the base."""
    from geometry_rl_tpu.envs import make_env

    env = make_env("rope_closing", num_envs=2, warmup_steps=0,
                   dynamic_friction_scale=1.0, restitution=0.1)
    state = env.reset(jax.random.PRNGKey(0))
    hanger_xy = state.scene.bodies.pos[:, env.cfg.num_grippers, :2]
    contacts = env._particle_contacts(hanger_xy)
    assert len(contacts) == 2  # ground + pole
    for c in contacts:
        assert c.restitution == 0.1
        assert c.dynamic_friction == c.friction
    state, ts = env.step(state, jnp.zeros((2, env.cfg.action_dim)))
    assert np.isfinite(np.asarray(ts.reward)).all()
