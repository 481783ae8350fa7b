"""Rigid task environment tests: shapes/specs, stepping, rewards, resets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.envs import make_env

B = 8


@pytest.fixture(scope="module")
def insertion_env():
    return make_env("rigid_insertion", num_envs=B, warmup_steps=0)


def rollout(env, n_steps, policy=None, key=jax.random.PRNGKey(0)):
    state = env.reset(key)
    steps = []
    for t in range(n_steps):
        if policy is None:
            action = jnp.zeros((env.cfg.num_envs, env.cfg.action_dim))
        else:
            action = policy(t, state)
        state, ts = env.step(state, action)
        steps.append(ts)
    return state, steps


def test_obs_spec_matches_obs(insertion_env):
    env = insertion_env
    state = env.reset(jax.random.PRNGKey(0))
    obs = env.observe(state)
    for group in ("scalars", "position_vectors", "velocity_vectors", "infos"):
        assert obs[group].shape == (B, env.obs_spec.group_dim(group)), group


def test_step_runs_and_is_finite(insertion_env):
    env = insertion_env
    state, steps = rollout(env, 3)
    for ts in steps:
        for group, v in ts.obs.items():
            assert np.isfinite(np.asarray(v)).all(), group
        assert np.isfinite(np.asarray(ts.reward)).all()


def test_episode_terminates_on_time(insertion_env):
    env = insertion_env
    state = env.reset(jax.random.PRNGKey(1))
    action = jnp.zeros((B, env.cfg.action_dim))
    for t in range(env.cfg.episode_length):
        state, ts = env.step(state, action)
    assert bool(ts.done.all())
    # auto-reset: episode_step back to 0
    assert (np.asarray(state.episode_step) == 0).all()


def test_reward_is_negative_distance_like(insertion_env):
    env = insertion_env
    state = env.reset(jax.random.PRNGKey(2))
    _, ts = env.step(state, jnp.zeros((B, env.cfg.action_dim)))
    assert (np.asarray(ts.reward) < 0).all()


def test_multi_asset_round_robin(insertion_env):
    env = insertion_env
    ids = np.asarray(env.shape_ids)
    assert (ids == np.arange(B) % 8).all()
    # different shapes have different point counts
    assert len(set(np.asarray(env.obj_num_points).tolist())) > 1


def test_action_moves_gripper(insertion_env):
    env = insertion_env
    state = env.reset(jax.random.PRNGKey(3))
    p0 = np.asarray(state.scene.bodies.pos[:, 0])
    action = jnp.zeros((B, 6)).at[:, 0].set(1.0)  # +x velocity
    state, _ = env.step(state, action)
    p1 = np.asarray(state.scene.bodies.pos[:, 0])
    # one control step = decimation*dt = 0.04 s at ~1 m/s (minus damping)
    assert (p1[:, 0] - p0[:, 0] > 0.01).all()


def test_attached_object_follows_gripper(insertion_env):
    env = insertion_env
    state = env.reset(jax.random.PRNGKey(4))
    obj = env.cfg.object_body
    rel0 = np.asarray(state.scene.bodies.pos[:, obj] - state.scene.bodies.pos[:, 0])
    y0 = np.asarray(state.scene.bodies.pos[:, obj, 1])
    action = jnp.zeros((B, 6)).at[:, 1].set(1.0)
    for _ in range(10):
        state, _ = env.step(state, action)
    rel1 = np.asarray(state.scene.bodies.pos[:, obj] - state.scene.bodies.pos[:, 0])
    # weld keeps the relative offset roughly fixed while moving
    assert np.linalg.norm(rel1 - rel0, axis=-1).max() < 0.1
    # object dragged along +y by ~10 steps * 0.04 s * ~1 m/s
    y1 = np.asarray(state.scene.bodies.pos[:, obj, 1])
    assert (y1 - y0 > 0.2).all()


def test_insertion_peg_rests_on_plate():
    """Dropped straight onto the plate (not the hole), the peg must not fall
    through it."""
    env = make_env("rigid_insertion", num_envs=4, warmup_steps=0)
    state = env.reset(jax.random.PRNGKey(5))
    # move object directly above plate material (offset from hole center)
    bodies = state.scene.bodies
    obj, tgt = env.cfg.object_body, env.cfg.target_body
    tgt_pos = bodies.pos[:, tgt]
    over_plate = tgt_pos + jnp.asarray([0.3, 0.0, 0.3])
    pos = bodies.pos.at[:, obj].set(over_plate)
    # gripper above it
    pos = pos.at[:, 0].set(over_plate + jnp.asarray([0.0, 0.0, 0.3]))
    quat = bodies.quat.at[:, obj].set(jnp.asarray([1.0, 0, 0, 0]))
    quat = quat.at[:, 0].set(jnp.asarray([1.0, 0, 0, 0]))
    state = state._replace(
        scene=state.scene._replace(bodies=bodies._replace(pos=pos, quat=quat))
    )
    action = jnp.zeros((4, 6))
    for _ in range(30):
        state, _ = env.step(state, action)
        state = state._replace(episode_step=jnp.zeros_like(state.episode_step))  # avoid reset
    z = np.asarray(state.scene.bodies.pos[:, obj, 2])
    plate_top = float(tgt_pos[0, 2]) + env.cfg.plate_half_thickness
    # peg bottom (z - half_height) must stay at or above the plate top
    assert (z - env.cfg.shape_half_height > plate_top - 0.02).all(), z


def test_pushing_env_contact_moves_object():
    env = make_env("rigid_pushing", num_envs=4)
    state = env.reset(jax.random.PRNGKey(6))
    obj = env.cfg.object_body
    # drive the gripper toward the object
    def policy(t, s):
        d = s.scene.bodies.pos[:, obj] - s.scene.bodies.pos[:, 0]
        d = d.at[:, 2].set(0.0)  # planar pushing (z_action=False anyway)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
        return d  # 3D linear action
    p0 = np.asarray(state.scene.bodies.pos[:, obj])
    for t in range(60):
        state, _ = env.step(state, policy(t, state))
        state = state._replace(episode_step=jnp.zeros_like(state.episode_step))
    p1 = np.asarray(state.scene.bodies.pos[:, obj])
    moved = np.linalg.norm(p1[:, :2] - p0[:, :2], axis=-1)
    assert (moved > 0.02).any(), moved  # at least some envs were pushed
    # planar: z never changes (locked)
    np.testing.assert_allclose(p1[:, 2], p0[:, 2], atol=1e-5)


def test_sliding_env_steps():
    env = make_env("rigid_sliding", num_envs=4)
    state = env.reset(jax.random.PRNGKey(7))
    state, ts = env.step(state, jnp.ones((4, 6)) * 0.5)
    assert np.isfinite(np.asarray(ts.reward)).all()
    assert env.cfg.shapes == ("L",)


def test_two_agents_env():
    env = make_env("rigid_insertion_two_agents", num_envs=4)
    assert env.cfg.action_dim == 6  # 2 grippers x 3 linear
    state = env.reset(jax.random.PRNGKey(8))
    state, ts = env.step(state, jnp.zeros((4, 6)))
    assert ts.obs["position_vectors"].shape[1] == env.obs_spec.group_dim("position_vectors")
    # two grippers in the obs spec
    assert env.obs_spec.dims["position_vectors"][0] == 6


def test_env_rollout_under_scan(insertion_env):
    """The whole env must run inside lax.scan (collector compatibility)."""
    env = insertion_env

    def body(state, _):
        state, ts = env.step(state, jnp.zeros((B, env.cfg.action_dim)))
        return state, ts.reward

    state = env.reset(jax.random.PRNGKey(9))
    _, rewards = jax.lax.scan(body, state, None, length=5)
    assert rewards.shape == (5, B)
    assert np.isfinite(np.asarray(rewards)).all()


def test_material_cfg_plumbs_into_contacts():
    """restitution / dynamic_friction_scale reach every contact set with the
    contact's own static coefficient as the base (scene_cfg.py
    RigidBodyMaterialCfg defaults: dynamic == static friction)."""
    env = make_env("rigid_pushing", num_envs=4, dynamic_friction_scale=1.0, restitution=0.25)
    state = env.reset(jax.random.PRNGKey(3))
    contacts, pair_contacts = env._contacts(state.scene)
    for c in contacts + pair_contacts:
        assert c.restitution == 0.25
        assert c.dynamic_friction == c.friction  # scale 1.0 -> dynamic == static
    # default stays off (round-1 quasi-static parity)
    env0 = make_env("rigid_pushing", num_envs=4)
    c0, p0 = env0._contacts(env0.reset(jax.random.PRNGKey(3)).scene)
    assert all(c.dynamic_friction == 0.0 and c.restitution == 0.0 for c in c0 + p0)


def test_pushing_velocity_pass_active_in_env_step():
    """With dynamic_friction_scale on, the body-pair velocity pass runs inside
    env.step and changes the pushed object's trajectory (exact Coulomb/
    restitution physics is gated analytically at sim level in test_sim.py;
    this guards the env-level wiring). Stays finite either way."""

    def run(scale):
        env = make_env("rigid_pushing", num_envs=4, dynamic_friction_scale=scale)
        state = env.reset(jax.random.PRNGKey(5))
        for _ in range(10):  # drive the stick into the object
            obj = state.scene.bodies.pos[:, env.cfg.object_body]
            grip = state.scene.bodies.pos[:, 0]
            d = obj - grip
            a = jnp.concatenate([d[:, :2] * 5.0, jnp.zeros((4, 1))], axis=-1)
            state, _ = env.step(state, a)
        return np.asarray(state.scene.bodies.pos[:, env.cfg.object_body])

    p_off, p_on = run(0.0), run(1.0)
    assert np.isfinite(p_on).all()
    delta = np.abs(p_off - p_on).max()
    assert 1e-5 < delta < 0.1, delta  # active, but a perturbation not a blowup
