"""XPBD simulator core tests: integration, joints, contacts, particles."""

import jax
import jax.numpy as jnp
import numpy as np

from geometry_rl_tpu.sim import (
    BodyAttachment,
    ContactSet,
    DistanceGroup,
    FixedJointSpec,
    ParticleSDFContact,
    ParticleSpec,
    ParticleState,
    RigidBodySpec,
    RigidBodyState,
    SceneState,
    axis_mask_from_bits,
    box_inertia,
    step_physics,
    xpbd_substep,
)

B = 2
DT = 0.01


def single_body_scene(pos=(0.0, 0.0, 1.0), mass=1.0, lin_damping=0.0, free_pos_bits=0, free_rot_bits=0):
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.tile(jnp.asarray(pos), (B, 1, 1)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)),
            ang_vel=jnp.zeros((B, 1, 3)),
        )
    )
    spec = RigidBodySpec(
        inv_mass=jnp.asarray([1.0 / mass]),
        inv_inertia=jnp.asarray([1.0 / box_inertia(mass, (0.1, 0.1, 0.1))]),
        gravity_scale=jnp.ones(1),
        lin_damping=jnp.full((1,), lin_damping),
        ang_damping=jnp.zeros(1),
        free_pos=axis_mask_from_bits(free_pos_bits)[None],
        free_rot=axis_mask_from_bits(free_rot_bits)[None],
    )
    return state, spec


def ground_sdf(points):
    phi = points[..., 2]
    n = jnp.zeros_like(points).at[..., 2].set(1.0)
    return phi, n


def test_free_fall():
    state, spec = single_body_scene()
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, iterations=1))
    for _ in range(100):  # 1 second
        state = step(state)
    # semi-implicit Euler: z = 1 - g*dt^2*(1+2+...+100) = 1 - g*dt^2*5050
    expected = 1.0 - 9.81 * DT * DT * 5050
    np.testing.assert_allclose(state.bodies.pos[:, 0, 2], expected, atol=1e-3)
    np.testing.assert_allclose(state.bodies.lin_vel[:, 0, 2], -9.81, atol=0.05)


def test_damping_slows_velocity():
    state, spec = single_body_scene(lin_damping=10.0)
    state = state._replace(
        bodies=state.bodies._replace(
            lin_vel=jnp.tile(jnp.asarray([1.0, 0, 0]), (B, 1, 1)),
            ang_vel=jnp.zeros((B, 1, 3)),
        )
    )
    spec = spec._replace(gravity_scale=jnp.zeros(1))
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, iterations=1))
    for _ in range(100):
        state = step(state)
    # v(t) = v0 * exp(-d*t) = exp(-10 * 1) ~ 4.5e-5
    assert float(jnp.abs(state.bodies.lin_vel[:, 0, 0]).max()) < 1e-3


def test_locked_z_never_falls():
    state, spec = single_body_scene(free_pos_bits=4)  # lock z (bit 2)
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, iterations=1))
    for _ in range(50):
        state = step(state)
    np.testing.assert_allclose(state.bodies.pos[:, 0, 2], 1.0, atol=1e-6)


def test_ground_contact_rests():
    state, spec = single_body_scene(pos=(0.0, 0.0, 0.3))
    # cube of half-extent 0.05: contact points at the 4 bottom corners
    corners = jnp.asarray(
        [[-0.05, -0.05, -0.05], [0.05, -0.05, -0.05], [-0.05, 0.05, -0.05], [0.05, 0.05, -0.05]]
    )
    contact = ContactSet(body=0, local_points=corners, sdf=ground_sdf, friction=0.5)
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, contacts=(contact,), iterations=4))
    for _ in range(200):  # 2 s, plenty to fall 0.25 m and settle
        state = step(state)
    # resting height: CoM at 0.05 (corner on the ground)
    np.testing.assert_allclose(state.bodies.pos[:, 0, 2], 0.05, atol=5e-3)
    assert float(jnp.abs(state.bodies.lin_vel).max()) < 0.1


def test_fixed_joint_holds_assembly():
    """Two bodies welded 1m apart; driving body 0 drags body 1 along."""
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.tile(jnp.asarray([[0.0, 0, 1.0], [1.0, 0, 1.0]]), (B, 1, 1)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 2, 1)),
            lin_vel=jnp.zeros((B, 2, 3)),
            ang_vel=jnp.zeros((B, 2, 3)),
        )
    )
    spec = RigidBodySpec(
        inv_mass=jnp.asarray([1.0 / 10.0, 1.0 / 0.1]),  # heavy gripper, light peg
        inv_inertia=jnp.stack(
            [1.0 / box_inertia(10.0, (0.1, 0.1, 0.1)), 1.0 / box_inertia(0.1, (0.1, 0.1, 0.1))]
        ),
        gravity_scale=jnp.zeros(2),
        lin_damping=jnp.zeros(2),
        ang_damping=jnp.zeros(2),
        free_pos=jnp.ones((2, 3)),
        # rotations locked, like the tasks' locked_rot_axis masks — the
        # assembly must translate rigidly
        free_rot=jnp.zeros((2, 3)),
    )
    joints = FixedJointSpec(
        body_a=jnp.asarray([0]),
        body_b=jnp.asarray([1]),
        local_pos_a=jnp.asarray([[0.5, 0.0, 0.0]]),
        local_pos_b=jnp.asarray([[-0.5, 0.0, 0.0]]),
        rel_quat=jnp.asarray([[1.0, 0, 0, 0]]),
    )

    step = jax.jit(lambda s: step_physics(s, spec, DT, decimation=4, joints=joints, iterations=8))
    # command +y velocity on body 0 each control step
    for _ in range(20):
        vel = state.bodies.lin_vel.at[:, 0].set(jnp.asarray([0.0, 1.0, 0.0]))
        state = state._replace(bodies=state.bodies._replace(lin_vel=vel))
        state = step(state)

    # body 1 must have moved with body 0, keeping ~1m separation
    sep = state.bodies.pos[:, 1] - state.bodies.pos[:, 0]
    np.testing.assert_allclose(np.linalg.norm(np.asarray(sep), axis=-1), 1.0, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(state.bodies.pos[:, 1, 1]), np.asarray(state.bodies.pos[:, 0, 1]), atol=0.05
    )
    assert float(state.bodies.pos[:, 1, 1].min()) > 0.5  # dragged along +y


def test_fixed_joint_free_assembly_pendulum():
    """With free rotations, driving the heavy body makes the light body trail
    (assembly rotates about the combined CoM) while the weld keeps the anchor
    coincident and the RELATIVE orientation fixed."""
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.tile(jnp.asarray([[0.0, 0, 1.0], [1.0, 0, 1.0]]), (B, 1, 1)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 2, 1)),
            lin_vel=jnp.zeros((B, 2, 3)),
            ang_vel=jnp.zeros((B, 2, 3)),
        )
    )
    spec = RigidBodySpec(
        inv_mass=jnp.asarray([1.0 / 10.0, 1.0 / 0.1]),
        inv_inertia=jnp.stack(
            [1.0 / box_inertia(10.0, (0.1, 0.1, 0.1)), 1.0 / box_inertia(0.1, (0.1, 0.1, 0.1))]
        ),
        gravity_scale=jnp.zeros(2),
        lin_damping=jnp.zeros(2),
        ang_damping=jnp.zeros(2),
        free_pos=jnp.ones((2, 3)),
        free_rot=jnp.ones((2, 3)),
    )
    joints = FixedJointSpec(
        body_a=jnp.asarray([0]),
        body_b=jnp.asarray([1]),
        local_pos_a=jnp.asarray([[0.5, 0.0, 0.0]]),
        local_pos_b=jnp.asarray([[-0.5, 0.0, 0.0]]),
        rel_quat=jnp.asarray([[1.0, 0, 0, 0]]),
    )
    step = jax.jit(lambda s: step_physics(s, spec, DT, decimation=4, joints=joints, iterations=8))
    for _ in range(20):
        vel = state.bodies.lin_vel.at[:, 0].set(jnp.asarray([0.0, 1.0, 0.0]))
        state = state._replace(bodies=state.bodies._replace(lin_vel=vel))
        state = step(state)

    sep = np.linalg.norm(np.asarray(state.bodies.pos[:, 1] - state.bodies.pos[:, 0]), axis=-1)
    np.testing.assert_allclose(sep, 1.0, atol=0.02)
    # relative orientation still identity (weld)
    from geometry_rl_tpu.utils.math import quat_error_magnitude

    err = quat_error_magnitude(state.bodies.quat[:, 0], state.bodies.quat[:, 1])
    assert float(err.max()) < 0.05


def test_fixed_joint_orientation_weld():
    """Rotating the driver rotates the attached body's orientation too."""
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.tile(jnp.asarray([[0.0, 0, 1.0], [1.0, 0, 1.0]]), (B, 1, 1)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 2, 1)),
            lin_vel=jnp.zeros((B, 2, 3)),
            ang_vel=jnp.zeros((B, 2, 3)),
        )
    )
    spec = RigidBodySpec(
        inv_mass=jnp.asarray([0.0, 1.0 / 0.1]),  # kinematic driver
        inv_inertia=jnp.stack([jnp.zeros(3), 1.0 / box_inertia(0.1, (0.1, 0.1, 0.1))]),
        gravity_scale=jnp.zeros(2),
        lin_damping=jnp.zeros(2),
        ang_damping=jnp.zeros(2),
        free_pos=jnp.ones((2, 3)),
        free_rot=jnp.ones((2, 3)),
    )
    joints = FixedJointSpec(
        body_a=jnp.asarray([0]),
        body_b=jnp.asarray([1]),
        local_pos_a=jnp.asarray([[0.5, 0.0, 0.0]]),
        local_pos_b=jnp.asarray([[-0.5, 0.0, 0.0]]),
        rel_quat=jnp.asarray([[1.0, 0, 0, 0]]),
    )
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, joints=joints, iterations=8))
    # spin driver about z
    for _ in range(50):
        w = state.bodies.ang_vel.at[:, 0].set(jnp.asarray([0.0, 0.0, 1.0]))
        state = state._replace(bodies=state.bodies._replace(ang_vel=w))
        state = step(state)

    # after 0.5s at 1 rad/s the assembly rotated ~0.5 rad: body 1 should be at
    # angle ~0.5 on the unit circle around body 0
    rel = np.asarray(state.bodies.pos[0, 1] - state.bodies.pos[0, 0])
    ang = np.arctan2(rel[1], rel[0])
    assert 0.3 < ang < 0.7, ang
    # orientation of body 1 follows (yaw ~ ang)
    q1 = np.asarray(state.bodies.quat[0, 1])
    yaw = 2 * np.arctan2(q1[3], q1[0])
    assert abs(yaw - ang) < 0.1


def test_particle_chain_and_attachment():
    """3-particle chain pinned to a kinematic body; driving the body drags the
    chain while segment lengths hold."""
    n_p = 3
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (B, 1, 1)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)),
            ang_vel=jnp.zeros((B, 1, 3)),
        ),
        particles=ParticleState(
            pos=jnp.tile(jnp.asarray([[0.0, 0, 1.0], [0.0, 0, 0.8], [0.0, 0, 0.6]]), (B, 1, 1)),
            vel=jnp.zeros((B, n_p, 3)),
        ),
    )
    spec = RigidBodySpec(
        inv_mass=jnp.zeros(1),
        inv_inertia=jnp.zeros((1, 3)),
        gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1),
        ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)),
        free_rot=jnp.ones((1, 3)),
    )
    p_spec = ParticleSpec(inv_mass=jnp.ones(n_p), lin_damping=1.0)
    groups = [
        DistanceGroup(
            i=jnp.asarray([0]), j=jnp.asarray([1]), rest=jnp.asarray([0.2]), compliance=jnp.zeros(1)
        ),
        DistanceGroup(
            i=jnp.asarray([1]), j=jnp.asarray([2]), rest=jnp.asarray([0.2]), compliance=jnp.zeros(1)
        ),
    ]
    att = BodyAttachment(
        particle=jnp.asarray([0]), body=jnp.asarray([0]), local_pos=jnp.asarray([[0.0, 0.0, 0.0]])
    )

    step = jax.jit(
        lambda s: xpbd_substep(
            s, spec, DT, particle_spec=p_spec, distance_groups=tuple(groups), attachments=att, iterations=8
        )
    )
    for _ in range(100):
        vel = state.bodies.lin_vel.at[:, 0].set(jnp.asarray([0.5, 0.0, 0.0]))
        state = state._replace(bodies=state.bodies._replace(lin_vel=vel))
        state = step(state)

    # pinned particle tracks the body
    np.testing.assert_allclose(
        np.asarray(state.particles.pos[:, 0]), np.asarray(state.bodies.pos[:, 0]), atol=0.01
    )
    # segment lengths preserved
    d01 = np.linalg.norm(np.asarray(state.particles.pos[:, 0] - state.particles.pos[:, 1]), axis=-1)
    d12 = np.linalg.norm(np.asarray(state.particles.pos[:, 1] - state.particles.pos[:, 2]), axis=-1)
    np.testing.assert_allclose(d01, 0.2, atol=0.02)
    np.testing.assert_allclose(d12, 0.2, atol=0.02)
    # chain was dragged +x
    assert float(state.particles.pos[:, 2, 0].min()) > 0.1


def test_particle_ground_contact():
    n_p = 2
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.zeros((B, 1, 3)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)),
            ang_vel=jnp.zeros((B, 1, 3)),
        ),
        particles=ParticleState(
            pos=jnp.tile(jnp.asarray([[0.0, 0, 0.5], [0.3, 0, 0.4]]), (B, 1, 1)),
            vel=jnp.zeros((B, n_p, 3)),
        ),
    )
    spec = RigidBodySpec(
        inv_mass=jnp.zeros(1),
        inv_inertia=jnp.zeros((1, 3)),
        gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1),
        ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)),
        free_rot=jnp.ones((1, 3)),
    )
    p_spec = ParticleSpec(inv_mass=jnp.ones(n_p))
    pc = ParticleSDFContact(sdf=ground_sdf, friction=0.3)
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, particle_spec=p_spec, particle_contacts=(pc,), iterations=2))
    for _ in range(150):
        state = step(state)
    assert float(state.particles.pos[..., 2].min()) > -1e-3
    assert float(jnp.abs(state.particles.vel).max()) < 0.2


def test_step_physics_jit_compiles():
    state, spec = single_body_scene()
    stepped = jax.jit(lambda s: step_physics(s, spec, DT, decimation=4, iterations=2))(state)
    assert np.isfinite(np.asarray(stepped.bodies.pos)).all()


# ---------------------------------------------------------------------------
# velocity pass: restitution + dynamic friction (XPBD §3.6)
# ---------------------------------------------------------------------------


def test_restitution_ball_bounces():
    """A dropped point-contact body with restitution e rebounds at ~e*v_in."""
    state, spec = single_body_scene(pos=(0.0, 0.0, 0.5))
    contact = ContactSet(
        body=0,
        local_points=jnp.asarray([[0.0, 0.0, 0.0]]),
        sdf=ground_sdf,
        friction=0.0,
        restitution=0.8,
    )
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, contacts=(contact,), iterations=4))
    v_in = v_out = 0.0
    for _ in range(60):  # impact at ~0.32 s (v ~ -3.1 m/s)
        prev_vz = float(state.bodies.lin_vel[0, 0, 2])
        state = step(state)
        vz = float(state.bodies.lin_vel[0, 0, 2])
        if prev_vz < -0.5 and vz > 0.0:
            v_in, v_out = -prev_vz, vz
            break
    assert v_in > 0.0, "ball never bounced"
    assert 0.6 * v_in < v_out < 0.95 * v_in  # ~0.8 modulo the impact substep


def test_restitution_zero_is_noop():
    """Default (restitution=0, dynamic_friction=0) contacts trace the exact
    same program as before the velocity pass existed."""
    state, spec = single_body_scene(pos=(0.0, 0.0, 0.3))
    corners = jnp.asarray(
        [[-0.05, -0.05, -0.05], [0.05, -0.05, -0.05], [-0.05, 0.05, -0.05], [0.05, 0.05, -0.05]]
    )
    c0 = ContactSet(body=0, local_points=corners, sdf=ground_sdf, friction=0.5)
    c1 = ContactSet(
        body=0, local_points=corners, sdf=ground_sdf, friction=0.5, restitution=0.0, dynamic_friction=0.0
    )
    s0, s1 = state, state
    step0 = jax.jit(lambda s: xpbd_substep(s, spec, DT, contacts=(c0,), iterations=4))
    step1 = jax.jit(lambda s: xpbd_substep(s, spec, DT, contacts=(c1,), iterations=4))
    for _ in range(100):
        s0, s1 = step0(s0), step1(s1)
    np.testing.assert_array_equal(np.asarray(s0.bodies.pos), np.asarray(s1.bodies.pos))
    np.testing.assert_array_equal(np.asarray(s0.bodies.lin_vel), np.asarray(s1.bodies.lin_vel))


def test_dynamic_friction_decelerates_slider():
    """A box sliding on the ground with mu_d decelerates at ~mu*g."""
    state, spec = single_body_scene(pos=(0.0, 0.0, 0.05))
    state = SceneState(
        bodies=state.bodies._replace(
            lin_vel=state.bodies.lin_vel.at[:, 0, 0].set(2.0),
        )
    )
    corners = jnp.asarray(
        [[-0.05, -0.05, -0.05], [0.05, -0.05, -0.05], [-0.05, 0.05, -0.05], [0.05, 0.05, -0.05]]
    )
    mu = 0.4
    contact = ContactSet(
        body=0, local_points=corners, sdf=ground_sdf, friction=0.0, dynamic_friction=mu
    )
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, contacts=(contact,), iterations=4))
    t, vx = 0.0, 2.0
    for i in range(200):
        state = step(state)
        t += DT
        vx = float(state.bodies.lin_vel[0, 0, 0])
        if vx < 0.05:
            break
    # analytic stop time: v0/(mu*g) = 2.0/(0.4*9.81) = 0.51 s
    assert 0.3 < t < 0.8, f"stopped at t={t:.2f}s vx={vx:.3f}"
    assert float(jnp.abs(state.bodies.lin_vel[0, 0, 0])) < 0.3


def test_particle_restitution_and_friction():
    """Particles with restitution bounce; with dynamic friction they stop sliding."""
    n_p = 2
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.zeros((B, 1, 3)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)),
            ang_vel=jnp.zeros((B, 1, 3)),
        ),
        particles=ParticleState(
            pos=jnp.tile(jnp.asarray([[0.0, 0, 0.5], [1.0, 0, 0.001]]), (B, 1, 1)),
            vel=jnp.tile(jnp.asarray([[0.0, 0, 0.0], [1.5, 0, 0.0]]), (B, 1, 1)),
        ),
    )
    spec = RigidBodySpec(
        inv_mass=jnp.zeros(1),
        inv_inertia=jnp.zeros((1, 3)),
        gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1),
        ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)),
        free_rot=jnp.ones((1, 3)),
    )
    p_spec = ParticleSpec(inv_mass=jnp.ones(n_p))
    pc = ParticleSDFContact(sdf=ground_sdf, friction=0.0, restitution=0.7, dynamic_friction=0.5)
    step = jax.jit(
        lambda s: xpbd_substep(s, spec, DT, particle_spec=p_spec, particle_contacts=(pc,), iterations=2)
    )
    bounced = False
    for _ in range(60):
        prev_vz = float(state.particles.vel[0, 0, 2])
        state = step(state)
        vz = float(state.particles.vel[0, 0, 2])
        if prev_vz < -0.5 and vz > 0.3:
            bounced = True
            break
    assert bounced, "particle with restitution never bounced"
    # the slider particle should have lost most of its speed to friction
    assert float(state.particles.vel[0, 1, 0]) < 1.0


def test_particle_self_collision_keeps_separation():
    """Two free particle clusters pushed through each other stay min_dist apart."""
    from geometry_rl_tpu.sim import ParticleSelfContact

    n_p = 2
    min_dist = 0.1
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.zeros((B, 1, 3)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)),
            ang_vel=jnp.zeros((B, 1, 3)),
        ),
        particles=ParticleState(
            pos=jnp.tile(jnp.asarray([[-0.2, 0, 1.0], [0.2, 0, 1.0]]), (B, 1, 1)),
            vel=jnp.tile(jnp.asarray([[2.0, 0, 0.0], [-2.0, 0, 0.0]]), (B, 1, 1)),
        ),
    )
    spec = RigidBodySpec(
        inv_mass=jnp.zeros(1),
        inv_inertia=jnp.zeros((1, 3)),
        gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1),
        ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)),
        free_rot=jnp.ones((1, 3)),
    )
    p_spec = ParticleSpec(inv_mass=jnp.ones(n_p))
    sc = ParticleSelfContact(
        min_dist=min_dist, pair_mask=1.0 - jnp.eye(n_p), active=jnp.ones(n_p)
    )
    # no gravity on particles: inv_mass>0 means gravity applies, so keep the
    # test in-plane by checking xy separation only
    step = jax.jit(
        lambda s: xpbd_substep(s, spec, DT, particle_spec=p_spec, self_contacts=(sc,), iterations=4)
    )
    min_sep = 1.0
    for _ in range(40):
        state = step(state)
        sep = float(
            jnp.linalg.norm(state.particles.pos[0, 0, :2] - state.particles.pos[0, 1, :2])
        )
        min_sep = min(min_sep, sep)
    assert min_sep > 0.9 * min_dist, f"particles interpenetrated: {min_sep:.4f}"


def test_self_collision_inactive_particles_do_not_repel():
    from geometry_rl_tpu.sim import ParticleSelfContact

    n_p = 2
    state_parts = ParticleState(
        pos=jnp.tile(jnp.asarray([[0.0, 0, 1.0], [0.01, 0, 1.0]]), (B, 1, 1)),
        vel=jnp.zeros((B, n_p, 3)),
    )
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.zeros((B, 1, 3)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)),
            ang_vel=jnp.zeros((B, 1, 3)),
        ),
        particles=state_parts,
    )
    spec = RigidBodySpec(
        inv_mass=jnp.zeros(1),
        inv_inertia=jnp.zeros((1, 3)),
        gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1),
        ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)),
        free_rot=jnp.ones((1, 3)),
    )
    p_spec = ParticleSpec(inv_mass=jnp.zeros(n_p))  # both pinned
    sc = ParticleSelfContact(
        min_dist=0.1, pair_mask=1.0 - jnp.eye(n_p), active=jnp.asarray([1.0, 0.0])
    )
    step = jax.jit(
        lambda s: xpbd_substep(s, spec, DT, particle_spec=p_spec, self_contacts=(sc,), iterations=4)
    )
    out = step(state)
    np.testing.assert_allclose(
        np.asarray(out.particles.pos), np.asarray(state.particles.pos), atol=1e-6
    )


def test_cloth_self_collision_env_steps():
    """Cloth env with self_collision=True steps without NaNs and keeps
    non-neighbor particles separated."""
    from geometry_rl_tpu.envs import make_env

    env = make_env("cloth_hanging", num_envs=2, warmup_steps=2, self_collision=True)
    assert env.solver_mode is False  # "auto" resolves to the XLA solver on CPU
    state = env.reset(jax.random.PRNGKey(3))
    for _ in range(5):
        state, ts = env.step(state, jnp.zeros((2, env.cfg.action_dim)))
    assert bool(jnp.isfinite(state.scene.particles.pos).all())


def test_two_joints_on_one_body_stay_stable():
    """Two grippers welded to ONE object (two-agent scenes): the Jacobi joint
    pass must average, not add, corrections to the shared body. The fixture
    is a real state captured from a diverging 1000-env two-agent run (env
    with shape 2, step 59) — without the 1/K joint-count scaling it goes
    NaN within one control step and the whole fleet follows."""
    import os

    from geometry_rl_tpu.envs import make_env
    from geometry_rl_tpu.envs.rigid import RigidEnvState
    from geometry_rl_tpu.sim import SceneState as SS

    d = np.load(os.path.join(os.path.dirname(__file__), "golden", "two_agent_joint_stress.npz"))
    BB = 8  # round-robin: env index == shape id; fixture is shape 2
    env = make_env("rigid_insertion_two_agents", num_envs=BB)
    tile = lambda a: jnp.asarray(np.tile(np.asarray(a)[None], (BB,) + (1,) * np.asarray(a).ndim))
    state = RigidEnvState(
        scene=SS(bodies=RigidBodyState(
            pos=tile(d["pos"]), quat=tile(d["quat"]),
            lin_vel=tile(d["lin"]), ang_vel=tile(d["ang"]))),
        episode_step=jnp.full((BB,), int(d["step"]), jnp.int32),
        key=jax.random.PRNGKey(0),
        prev_action=jnp.zeros((BB, env.cfg.action_dim)),
    )
    action = jnp.asarray(np.tile(d["action"][None], (BB, 1)))
    s = state
    for _ in range(10):
        s, _ = env.step(s, action)
    assert bool(jnp.isfinite(s.scene.bodies.pos).all()), "two-joint assembly diverged"
    assert float(jnp.abs(s.scene.bodies.pos).max()) < 10.0


def test_multi_point_restitution_not_amplified():
    """A box dropped FLAT onto 4 coplanar corners must rebound at ~e*v_in,
    not K*e*v_in: velocity-target impulses are averaged over the active
    contact count (each point alone would fully cancel the shared body
    velocity, so summing 4 of them injects energy)."""
    state, spec = single_body_scene(pos=(0.0, 0.0, 0.3))
    corners = jnp.asarray(
        [[-0.05, -0.05, -0.05], [0.05, -0.05, -0.05], [-0.05, 0.05, -0.05], [0.05, 0.05, -0.05]]
    )
    e = 0.8
    contact = ContactSet(
        body=0, local_points=corners, sdf=ground_sdf, friction=0.0, restitution=e
    )
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, contacts=(contact,), iterations=4))
    v_in = v_out = 0.0
    for _ in range(60):
        prev_vz = float(state.bodies.lin_vel[0, 0, 2])
        state = step(state)
        vz = float(state.bodies.lin_vel[0, 0, 2])
        if prev_vz < -0.5 and vz > 0.0:
            v_in, v_out = -prev_vz, vz
            break
    assert v_in > 0.0, "box never bounced"
    # must NOT exceed e*v_in (4 corners would give ~4x without averaging)
    assert v_out <= e * v_in * 1.05, f"energy gained: v_in={v_in:.3f} v_out={v_out:.3f}"
    assert v_out > 0.5 * e * v_in, f"over-damped: v_in={v_in:.3f} v_out={v_out:.3f}"


def _two_body_stack_scene():
    """Falling unit box (body 0) above a static table body (body 1)."""
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.tile(jnp.asarray([[0.0, 0.0, 0.6], [0.0, 0.0, 0.0]]), (B, 1, 1)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 2, 1)),
            lin_vel=jnp.zeros((B, 2, 3)),
            ang_vel=jnp.zeros((B, 2, 3)),
        )
    )
    spec = RigidBodySpec(
        inv_mass=jnp.asarray([1.0, 0.0]),
        inv_inertia=jnp.stack(
            [1.0 / box_inertia(1.0, (0.1, 0.1, 0.1)), jnp.zeros(3)]
        ),
        gravity_scale=jnp.asarray([1.0, 0.0]),
        lin_damping=jnp.zeros(2),
        ang_damping=jnp.zeros(2),
        free_pos=jnp.ones((2, 3)),
        free_rot=jnp.ones((2, 3)),
    )
    return state, spec


def _table_top_sdf(local_pts):
    """Static body 1 local SDF: halfspace with surface at local z = +0.1."""
    phi = local_pts[..., 2] - 0.1
    n = jnp.zeros_like(local_pts).at[..., 2].set(1.0)
    return phi, n


def test_body_pair_restitution_bounces():
    """Body-pair contact with restitution: a box dropped onto a static body
    rebounds at ~e*v_in (VERDICT #6 — PhysX applies material restitution to
    body-body pairs)."""
    from geometry_rl_tpu.sim import BodyPairContact

    state, spec = _two_body_stack_scene()
    corners = jnp.asarray(
        [[-0.05, -0.05, -0.05], [0.05, -0.05, -0.05], [-0.05, 0.05, -0.05], [0.05, 0.05, -0.05]]
    )
    e = 0.8
    pair = BodyPairContact(
        body_points=0, body_sdf=1, local_points=corners, sdf=_table_top_sdf,
        friction=0.0, restitution=e,
    )
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, pair_contacts=(pair,), iterations=4))
    v_in = v_out = 0.0
    for _ in range(80):
        prev_vz = float(state.bodies.lin_vel[0, 0, 2])
        state = step(state)
        vz = float(state.bodies.lin_vel[0, 0, 2])
        if prev_vz < -0.5 and vz > 0.0:
            v_in, v_out = -prev_vz, vz
            break
    assert v_in > 0.0, "box never bounced off the static body"
    assert v_out <= e * v_in * 1.05, f"energy gained: v_in={v_in:.3f} v_out={v_out:.3f}"
    assert v_out > 0.5 * e * v_in, f"over-damped: v_in={v_in:.3f} v_out={v_out:.3f}"
    # static body must not move
    np.testing.assert_allclose(np.asarray(state.bodies.pos[:, 1]), [[0.0, 0.0, 0.0]] * B, atol=1e-6)


def test_body_pair_dynamic_friction_decelerates():
    """Body-pair dynamic friction: a box sliding on a static body slows at
    ~mu*g and eventually stops."""
    from geometry_rl_tpu.sim import BodyPairContact

    state, spec = _two_body_stack_scene()
    state = SceneState(
        bodies=state.bodies._replace(
            pos=state.bodies.pos.at[:, 0, 2].set(0.15),
            lin_vel=state.bodies.lin_vel.at[:, 0, 0].set(2.0),
        )
    )
    corners = jnp.asarray(
        [[-0.05, -0.05, -0.05], [0.05, -0.05, -0.05], [-0.05, 0.05, -0.05], [0.05, 0.05, -0.05]]
    )
    mu = 0.4
    pair = BodyPairContact(
        body_points=0, body_sdf=1, local_points=corners, sdf=_table_top_sdf,
        friction=0.0, dynamic_friction=mu,
    )
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, pair_contacts=(pair,), iterations=4))
    t, vx = 0.0, 2.0
    for _ in range(200):
        state = step(state)
        t += DT
        vx = float(state.bodies.lin_vel[0, 0, 0])
        if vx < 0.05:
            break
    # analytic stop time: v0/(mu*g) = 2.0/(0.4*9.81) = 0.51 s
    assert 0.3 < t < 0.8, f"stopped at t={t:.2f}s vx={vx:.3f}"


def test_body_pair_zero_is_noop():
    """BodyPairContact with restitution=0, dynamic_friction=0 traces the same
    program as before the velocity pass existed."""
    from geometry_rl_tpu.sim import BodyPairContact

    state, spec = _two_body_stack_scene()
    corners = jnp.asarray(
        [[-0.05, -0.05, -0.05], [0.05, -0.05, -0.05], [-0.05, 0.05, -0.05], [0.05, 0.05, -0.05]]
    )
    p0 = BodyPairContact(body_points=0, body_sdf=1, local_points=corners, sdf=_table_top_sdf)
    p1 = BodyPairContact(
        body_points=0, body_sdf=1, local_points=corners, sdf=_table_top_sdf,
        restitution=0.0, dynamic_friction=0.0,
    )
    s0, s1 = state, state
    step0 = jax.jit(lambda s: xpbd_substep(s, spec, DT, pair_contacts=(p0,), iterations=4))
    step1 = jax.jit(lambda s: xpbd_substep(s, spec, DT, pair_contacts=(p1,), iterations=4))
    for _ in range(100):
        s0, s1 = step0(s0), step1(s1)
    np.testing.assert_array_equal(np.asarray(s0.bodies.pos), np.asarray(s1.bodies.pos))
    np.testing.assert_array_equal(np.asarray(s0.bodies.lin_vel), np.asarray(s1.bodies.lin_vel))


def test_opposing_wall_restitution_not_cancelled():
    """Two loaded contact points on OPPOSITE channel walls: the approach-side
    wall must still reflect the body. A single centroid/mean-normal manifold
    averages the opposing normals to ~zero and produces no impulse at all;
    co-normal grouping keeps the walls as separate manifolds."""
    from geometry_rl_tpu.sim.xpbd import _velocity_pass_body_contact

    state, spec = single_body_scene(pos=(0.0, 0.0, 1.0))
    lin_vel = jnp.zeros((B, 1, 3)).at[:, 0, 0].set(1.0)  # toward the +x wall
    ang_vel = jnp.zeros((B, 1, 3))

    def channel_sdf(points):
        # walls at x = +-0.05, normals pointing inward (toward the center)
        x = points[..., 0]
        phi = 0.05 - jnp.abs(x)
        n = jnp.zeros_like(points).at[..., 0].set(-jnp.sign(x))
        return phi, n

    pts = jnp.asarray([[0.05, 0.0, 0.0], [-0.05, 0.0, 0.0]])
    contact = ContactSet(
        body=0, local_points=pts, sdf=channel_sdf, friction=0.0, restitution=0.8
    )
    lam_n = jnp.full((B, 2), 1e-3)  # both walls loaded (press fit)
    bodies = state.bodies
    new_v, _ = _velocity_pass_body_contact(
        lin_vel, ang_vel, bodies.pos, bodies.quat, bodies.pos, bodies.quat,
        lin_vel, ang_vel, spec, contact, lam_n, DT,
    )
    vx = float(new_v[0, 0, 0])
    # reflected off the +x wall (a cancelled mean normal leaves vx at +1.0),
    # without exceeding the incoming speed (Jacobi over-correction)
    assert vx < -0.4, f"no reflection: vx={vx:.3f}"
    assert vx >= -1.0, f"energy gained: vx={vx:.3f}"


def test_conormal_manifold_grouping():
    """_conormal_manifolds: coplanar normals form ONE group (centroid/mean
    aggregates = the classic single manifold), orthogonal normals stay in
    separate per-face groups."""
    from geometry_rl_tpu.sim.xpbd import _conormal_manifolds

    # 3 points: two on the floor (n=+z), one on a wall (n=+x)
    n = jnp.asarray([[[0.0, 0, 1], [0, 0, 1], [1, 0, 0]]])
    active = jnp.ones((1, 3))
    lam = jnp.asarray([[1.0, 2.0, 4.0]])
    r = jnp.asarray([[[1.0, 0, 0], [3.0, 0, 0], [0, 0, 5.0]]])
    cnt, n_bar, lam_tot, (r_bar,) = _conormal_manifolds(active, n, lam, (r,))
    np.testing.assert_allclose(np.asarray(cnt[0]), [2.0, 2.0, 1.0])
    np.testing.assert_allclose(np.asarray(lam_tot[0]), [3.0, 3.0, 4.0])
    np.testing.assert_allclose(np.asarray(r_bar[0, 0]), [2.0, 0, 0])  # floor centroid
    np.testing.assert_allclose(np.asarray(r_bar[0, 2]), [0, 0, 5.0])  # wall alone
    np.testing.assert_allclose(np.asarray(n_bar[0, 0]), [0, 0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n_bar[0, 2]), [1.0, 0, 0], atol=1e-6)

    # inactive points join no group
    active2 = jnp.asarray([[1.0, 0.0, 1.0]])
    cnt2, _, lam2, _ = _conormal_manifolds(active2, n, lam, (r,))
    np.testing.assert_allclose(np.asarray(cnt2[0]), [1.0, 1.0, 1.0])  # clamped >= 1
    np.testing.assert_allclose(np.asarray(lam2[0]), [1.0, 0.0, 4.0])


def test_static_friction_angle_coulomb_cone():
    """Analytic (non-self-referential) friction gate: a flat plate on an
    inclined plane holds below the Coulomb friction angle atan(mu) and
    slides above it. Plate 0.2x0.2x0.04 so toppling (~79 deg) cannot
    masquerade as sliding."""
    corners = jnp.asarray(
        [[sx * 0.1, sy * 0.1, sz * 0.02] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )

    def run(theta_deg, mu, steps=200):
        th = np.deg2rad(theta_deg)
        n = jnp.asarray([-np.sin(th), 0.0, np.cos(th)])
        t_dir = jnp.asarray([np.cos(th), 0.0, np.sin(th)])
        quat = jnp.asarray([np.cos(-th / 2), 0.0, np.sin(-th / 2), 0.0])
        center = 0.02 * n
        state, spec = single_body_scene(pos=tuple(np.asarray(center)))
        state = state._replace(bodies=state.bodies._replace(quat=jnp.tile(quat, (B, 1, 1))))

        def plane_sdf(p):
            return jnp.sum(p * n, axis=-1), jnp.broadcast_to(n, p.shape)

        contact = ContactSet(body=0, local_points=corners, sdf=plane_sdf, friction=mu)
        step = jax.jit(lambda s: xpbd_substep(s, spec, DT, contacts=(contact,), iterations=8))
        for _ in range(steps):
            state = step(state)
        return float(jnp.sum((state.bodies.pos[0, 0] - center) * t_dir))

    assert abs(run(30, 1.0)) < 0.05   # below atan(1.0)=45 deg: holds (creep only)
    assert run(60, 1.0) < -1.0        # above: slides downhill
    assert abs(run(60, 2.0)) < 0.05   # below atan(2.0)=63.4 deg: holds
    assert run(30, 0.0) < -1.0        # frictionless control slides anywhere


def test_pinned_chain_settles_to_catenary():
    """Analytic particle-constraint gate: a pinned inextensible chain under
    gravity settles to a catenary. XPBD's residual per-substep stretch is a
    few percent at 12 iterations, so the shape is compared against the
    catenary of the MEASURED arc length (pure shape property); pointwise
    agreement is sub-millimeter."""
    from scipy.optimize import brentq

    P, S, L = 33, 1.0, 1.2
    x0 = np.zeros((P, 3))
    x0[:, 0] = np.linspace(0, S, P)
    inv_m = np.ones(P)
    inv_m[0] = inv_m[-1] = 0.0
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.zeros((B, 1, 3)), quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)), ang_vel=jnp.zeros((B, 1, 3)),
        ),
        particles=ParticleState(pos=jnp.tile(jnp.asarray(x0), (B, 1, 1)), vel=jnp.zeros((B, P, 3))),
    )
    spec = RigidBodySpec(
        inv_mass=jnp.zeros(1), inv_inertia=jnp.zeros((1, 3)), gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1), ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)), free_rot=jnp.ones((1, 3)),
    )
    rest = L / (P - 1)
    groups = tuple(
        DistanceGroup(i=jnp.asarray(idx), j=jnp.asarray(idx + 1),
                      rest=jnp.full(len(idx), rest), compliance=jnp.zeros(len(idx)))
        for idx in (np.arange(0, P - 1, 2), np.arange(1, P - 1, 2))
    )
    p_spec = ParticleSpec(inv_mass=jnp.asarray(inv_m), lin_damping=1.0)
    step = jax.jit(lambda s: xpbd_substep(s, spec, DT, particle_spec=p_spec,
                                          distance_groups=groups, iterations=12))
    for _ in range(2500):
        state = step(state)

    assert float(jnp.abs(state.particles.vel).max()) < 1e-4  # settled
    pos = np.asarray(state.particles.pos[0])
    seg = np.linalg.norm(np.diff(pos, axis=0), axis=-1)
    Lm = float(seg.sum())
    assert abs(Lm - L) / L < 0.04  # residual XPBD stretch stays small

    a = brentq(lambda a: 2 * a * np.sinh(S / (2 * a)) - Lm, 0.05, 10.0)
    sag = a * (np.cosh(S / (2 * a)) - 1)
    z = pos[:, 2]
    assert abs(-z.min() - sag) / sag < 0.01  # sag matches to 1%
    z_analytic = a * np.cosh((pos[:, 0] - S / 2) / a) - a * np.cosh(S / (2 * a))
    assert np.abs(z - z_analytic).max() < 2e-3  # sub-2mm pointwise


def _free_tumbling_scene(inertia_diag, w0):
    """One free body, no gravity/damping, prescribed body-frame diag inertia."""
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.zeros((B, 1, 3)),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)),
            ang_vel=jnp.tile(jnp.asarray(w0), (B, 1, 1)),
        )
    )
    spec = RigidBodySpec(
        inv_mass=jnp.ones(1),
        inv_inertia=1.0 / jnp.asarray([inertia_diag]),
        gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1),
        ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)),
        free_rot=jnp.ones((1, 3)),
    )
    return state, spec


def test_gyroscopic_dzhanibekov_flip_conserves_momentum():
    """Implicit gyroscopic integration (PhysX eENABLE_GYROSCOPIC_FORCES
    equivalent): a body spun about its intermediate inertia axis with a tiny
    perturbation must tumble (Dzhanibekov effect) while conserving world-frame
    angular momentum L = R I_b R^T w. Without the term, w never changes.

    Uses dt=2ms: XPBD's quat-delta velocity recovery damps |w| by
    O((w*dt)^2) per step, so momentum conservation is checked in the
    small-dt regime where the integrator is meant to operate."""
    from geometry_rl_tpu.utils.math import quat_apply, quat_conjugate

    inertia = (1.0, 2.0, 3.0)  # distinct; y = intermediate axis
    w0 = (0.02, 5.0, 0.0)  # spin about y + small x perturbation
    state, spec = _free_tumbling_scene(inertia, w0)
    dt = 0.002

    def world_L(s):
        wb = quat_apply(quat_conjugate(s.bodies.quat), s.bodies.ang_vel)
        return quat_apply(s.bodies.quat, jnp.asarray(inertia) * wb)

    def body(s, _):
        s = xpbd_substep(s, spec, dt, iterations=1, gyroscopic=True)
        wb_y = quat_apply(quat_conjugate(s.bodies.quat), s.bodies.ang_vel)[..., 1]
        return s, wb_y

    L0 = np.asarray(world_L(state))
    state, wy = jax.jit(lambda s: jax.lax.scan(body, s, None, length=3000))(state)
    L1 = np.asarray(world_L(state))
    # the intermediate-axis spin reversed at some point (the flip)
    assert float(np.asarray(wy).min()) < -3.0, np.asarray(wy).min()
    # |L| conserved to integrator tolerance over 6 s of tumbling (the
    # linearized quat update loses O((w*dt)^2) rotation per step; at the
    # ~10 rad/s tumble peak that integrates to a few percent over 3000 steps)
    np.testing.assert_allclose(np.linalg.norm(L1, axis=-1), np.linalg.norm(L0, axis=-1), rtol=5e-2)
    # direction too (free body: L is constant in the world frame)
    cos = (L0 * L1).sum(-1) / (np.linalg.norm(L0, axis=-1) * np.linalg.norm(L1, axis=-1))
    assert (cos > 0.99).all(), cos


def test_gyroscopic_off_is_noop_and_principal_axis_stable():
    """Default (off) path is unchanged, and with the term ON a principal-axis
    spin stays a principal-axis spin (w x Iw = 0). |w| decays O((w*dt)^2)
    per step from the quat-delta velocity recovery — identically in both."""
    inertia = (1.0, 2.0, 3.0)
    state, spec = _free_tumbling_scene(inertia, (0.0, 0.0, 4.0))  # major axis
    step_on = jax.jit(lambda s: xpbd_substep(s, spec, DT, iterations=1, gyroscopic=True))
    step_off = jax.jit(lambda s: xpbd_substep(s, spec, DT, iterations=1))
    s_on, s_off = state, state
    for _ in range(50):
        s_on, s_off = step_on(s_on), step_off(s_off)
    np.testing.assert_allclose(np.asarray(s_on.bodies.ang_vel), np.asarray(s_off.bodies.ang_vel), atol=1e-5)
    w = np.asarray(s_off.bodies.ang_vel[0, 0])
    np.testing.assert_allclose(w[:2], 0.0, atol=1e-6)  # stays on the axis
    np.testing.assert_allclose(w[2], 4.0, rtol=2e-2)  # recovery damping only


def test_restitution_bounce_height_rigid():
    """Analytic restitution gate (VERDICT r2 item 6a): a rigid box dropped
    from height h rebounds to ~e^2*h through the velocity pass. Apex error
    is bounded by the one-substep impact-velocity discretization (g*dt on
    v_impact) plus the XPBD penetration correction, so tolerance is 10%."""
    h, e, half = 0.5, 0.6, 0.05

    def drop(restitution):
        state, spec = single_body_scene(pos=(0.0, 0.0, half + h))
        corners = jnp.asarray(
            [[sx * half, sy * half, sz * half] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        contact = ContactSet(
            body=0, local_points=corners, sdf=ground_sdf, friction=0.0,
            restitution=restitution,
        )
        step = jax.jit(lambda s: xpbd_substep(s, spec, DT, contacts=(contact,), iterations=8))
        apex, bounced = 0.0, False
        for _ in range(400):
            state = step(state)
            z = float(state.bodies.pos[0, 0, 2]) - half
            vz = float(state.bodies.lin_vel[0, 0, 2])
            if bounced:
                apex = max(apex, z)
                if vz < 0 and apex > 0:  # passed the rebound apex
                    break
            elif vz > 0:
                bounced = True
        return apex

    apex = drop(e)
    assert abs(apex - e**2 * h) / (e**2 * h) < 0.10, f"apex {apex:.4f} vs {e**2*h:.4f}"
    # e=0 control: no measurable rebound
    assert drop(0.0) < 0.01


def test_restitution_bounce_height_particle():
    """Same analytic e^2*h gate through the PARTICLE velocity pass
    (cloth/rope contacts, ParticleSDFContact.restitution)."""
    h, e = 0.5, 0.6
    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.zeros((B, 1, 3)), quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)), ang_vel=jnp.zeros((B, 1, 3)),
        ),
        particles=ParticleState(
            pos=jnp.tile(jnp.asarray([[0.0, 0.0, h]]), (B, 1, 1)), vel=jnp.zeros((B, 1, 3))
        ),
    )
    spec = RigidBodySpec(
        inv_mass=jnp.zeros(1), inv_inertia=jnp.zeros((1, 3)), gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1), ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)), free_rot=jnp.ones((1, 3)),
    )
    p_spec = ParticleSpec(inv_mass=jnp.ones(1), lin_damping=0.0)
    contact = ParticleSDFContact(sdf=ground_sdf, friction=0.0, restitution=e)
    step = jax.jit(
        lambda s: xpbd_substep(s, spec, DT, particle_spec=p_spec, particle_contacts=(contact,), iterations=8)
    )
    apex, bounced = 0.0, False
    for _ in range(400):
        state = step(state)
        z = float(state.particles.pos[0, 0, 2])
        vz = float(state.particles.vel[0, 0, 2])
        if bounced:
            apex = max(apex, z)
            if vz < 0 and apex > 0:
                break
        elif vz > 0:
            bounced = True
    assert abs(apex - e**2 * h) / (e**2 * h) < 0.10, f"apex {apex:.4f} vs {e**2*h:.4f}"


def test_cloth_drape_settles_to_catenary_of_strips():
    """Independent (non-self-referential) cloth gate (VERDICT r2 item 6b):
    the ACTUAL cloth-hanging grid constraint topology (envs/cloth.py
    grid_constraints, all stretch/shear/bend families at env compliances),
    pinned along two opposite edge columns with slack, settles to a
    cylindrical drape whose every row matches the catenary of the measured
    arc length — the same closed form as the chain gate, but through the
    full 2D cloth machinery (a developable drape is an isometry, so shear
    and bend families must not distort the shape)."""
    from scipy.optimize import brentq

    from geometry_rl_tpu.envs.cloth import N_ROW, grid_constraints

    span_cols = 0.85  # pinned-edge separation (fraction of flat width): slack
    spacing = 1.0 / (N_ROW - 1)
    # flat grid laid out in x (columns) / y (rows), edge columns pre-pinned
    # at reduced separation so the sheet must sag
    cols = np.linspace(0.0, span_cols, N_ROW)
    x0 = np.zeros((N_ROW * N_ROW, 3))
    for r in range(N_ROW):
        for c in range(N_ROW):
            # interior points start on a shallow parabola to break symmetry
            xx = cols[c]
            sag0 = -0.2 * np.sin(np.pi * c / (N_ROW - 1))
            x0[r * N_ROW + c] = (xx, r * spacing, sag0 if 0 < c < N_ROW - 1 else 0.0)
    inv_m = np.ones(N_ROW * N_ROW)
    for r in range(N_ROW):
        inv_m[r * N_ROW + 0] = 0.0
        inv_m[r * N_ROW + N_ROW - 1] = 0.0

    state = SceneState(
        bodies=RigidBodyState(
            pos=jnp.zeros((B, 1, 3)), quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, 1, 1)),
            lin_vel=jnp.zeros((B, 1, 3)), ang_vel=jnp.zeros((B, 1, 3)),
        ),
        particles=ParticleState(pos=jnp.tile(jnp.asarray(x0), (B, 1, 1)), vel=jnp.zeros((B, N_ROW * N_ROW, 3))),
    )
    spec = RigidBodySpec(
        inv_mass=jnp.zeros(1), inv_inertia=jnp.zeros((1, 3)), gravity_scale=jnp.zeros(1),
        lin_damping=jnp.zeros(1), ang_damping=jnp.zeros(1),
        free_pos=jnp.ones((1, 3)), free_rot=jnp.ones((1, 3)),
    )
    # env compliance mapping (ClothTaskCfg defaults), stretch rigid for the
    # inextensible closed form
    compliance = {"stretch": 0.0, "shear": 1e-2, "bend": 2.0}
    rest = {"stretch": spacing, "shear": spacing * np.sqrt(2.0), "bend": 2 * spacing}
    groups = tuple(
        DistanceGroup(
            i=jnp.asarray(g[:, 0], jnp.int32), j=jnp.asarray(g[:, 1], jnp.int32),
            rest=jnp.full(len(g), rest[fam]), compliance=jnp.full(len(g), compliance[fam]),
        )
        for fam, g in grid_constraints()
    )
    p_spec = ParticleSpec(inv_mass=jnp.asarray(inv_m), lin_damping=1.0)
    step = jax.jit(
        lambda s: xpbd_substep(s, spec, DT, particle_spec=p_spec, distance_groups=groups, iterations=12)
    )
    for _ in range(3000):
        state = step(state)
    assert float(jnp.abs(state.particles.vel).max()) < 2e-4  # settled

    pos = np.asarray(state.particles.pos[0]).reshape(N_ROW, N_ROW, 3)
    # every row is the same catenary: check the center row pointwise and the
    # sag of all rows for cylindrical (strip-wise) consistency
    row = pos[N_ROW // 2]
    seg = np.linalg.norm(np.diff(row, axis=0), axis=-1)
    Lm = float(seg.sum())
    assert abs(Lm - 1.0) < 0.05  # residual XPBD stretch stays small
    a = brentq(lambda a: 2 * a * np.sinh(span_cols / (2 * a)) - Lm, 0.02, 10.0)
    sag = a * (np.cosh(span_cols / (2 * a)) - 1)
    z = row[:, 2]
    assert abs(-z.min() - sag) / sag < 0.03, f"sag {-z.min():.4f} vs catenary {sag:.4f}"
    z_analytic = a * np.cosh((row[:, 0] - span_cols / 2) / a) - a * np.cosh(span_cols / (2 * a))
    assert np.abs(z - z_analytic).max() < 5e-3  # pointwise < 5mm on a 1m sheet
    # cylindrical drape: all rows share the same profile (isometry respected)
    sags = pos[:, :, 2].min(axis=1)
    assert np.abs(sags - sags.mean()).max() < 5e-3
