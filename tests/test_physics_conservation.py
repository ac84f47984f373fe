"""Physics conservation laws in free flight (no contact, no actuation) —
the integrator/dynamics oracle tests that need no reference engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walk_these_ways_tpu.models.robot import go1, default_dof_pos
from walk_these_ways_tpu.physics import engine as eng
from walk_these_ways_tpu.go1_config import GO1_DEFAULT_JOINT_ANGLES

N = 2


def _airborne_state(rng):
    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    k1, k2, k3 = jax.random.split(rng, 3)
    return model, eng.PhysicsState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 50.0]), (N, 1)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1)),
        base_lin_vel=jax.random.uniform(k1, (N, 3), minval=-1, maxval=1),
        base_ang_vel=jax.random.uniform(k2, (N, 3), minval=-2, maxval=2),
        q=jnp.tile(ddp, (N, 1)),
        qd=jax.random.uniform(k3, (N, 12), minval=-1, maxval=1) * 0.0,
    )


def _momentum(model, state, dyn):
    """Linear momentum and CoM velocity from the generalized state."""
    frames = eng.forward_kinematics(model, state)
    Sw, Sv = eng.joint_twists(model, frames, state.base_pos)
    gen_vel = jnp.concatenate(
        [state.base_ang_vel, state.base_lin_vel, state.qd], axis=-1)
    Vw, Vv = eng.body_twists(model, Sw, Sv, gen_vel)
    blk = eng.inertia_blocks(model, frames, state.base_pos, dyn)
    # P = sum_b m_b * v_com_b ; v_com = Vv + Vw x r_com
    r = frames.com - state.base_pos[:, None, :]
    v_com = Vv + jnp.cross(Vw, r)
    P = jnp.sum(blk.m[..., None] * v_com, axis=1)
    return P


def test_linear_momentum_under_gravity():
    """In free flight dP/dt = m_total * g exactly."""
    model, state = _airborne_state(jax.random.PRNGKey(0))
    params = eng.SimParams(contact_enabled=False)
    dyn = eng.identity_dynamics_params(N, gravity=(0.0, 0.0, -9.8))
    terr = eng.flat_terrain()
    tau = jnp.zeros((N, 12))

    P0 = np.asarray(_momentum(model, state, dyn))
    steps = 100

    def body(s, _):
        s2, _ = eng.physics_substep(model, params, s, tau, dyn, terr)
        return s2, None

    state2, _ = jax.lax.scan(body, state, None, length=steps)
    P1 = np.asarray(_momentum(model, state2, dyn))
    expected = P0 + model.mass.sum() * np.array([0, 0, -9.8]) * steps * params.dt
    np.testing.assert_allclose(P1, expected, rtol=2e-2, atol=2e-2)


def test_airborne_joint_motion_conserves_momentum():
    """Flailing legs in the air must not change total linear momentum beyond
    gravity's contribution (internal forces cancel)."""
    model, state = _airborne_state(jax.random.PRNGKey(1))
    params = eng.SimParams(contact_enabled=False)
    dyn = eng.identity_dynamics_params(N, gravity=(0.0, 0.0, 0.0))
    terr = eng.flat_terrain()

    P0 = np.asarray(_momentum(model, state, dyn))

    def body(s, i):
        # gentle torques: stay below the joint velocity clamp, which is a
        # deliberately momentum-violating safety feature (PhysX maxVelocity)
        tau = 0.25 * jnp.sin(0.2 * i) * jnp.ones((N, 12))
        s2, _ = eng.physics_substep(model, params, s, tau, dyn, terr)
        return s2, None

    state2, _ = jax.lax.scan(body, state, jnp.arange(60))
    P1 = np.asarray(_momentum(model, state2, dyn))
    np.testing.assert_allclose(P1, P0, atol=0.15)


def test_restitution_bounce():
    """Restitution oracle: drop the robot upside down so the rigid trunk box
    (not the compliant legs) hits the ground — e=0.9 must rebound at most of
    the impact speed, e=0 must stop dead."""
    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    state = eng.PhysicsState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.5]), (N, 1)),
        base_quat=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (N, 1)),  # flipped
        base_lin_vel=jnp.zeros((N, 3)),
        base_ang_vel=jnp.zeros((N, 3)),
        q=jnp.tile(ddp, (N, 1)),
        qd=jnp.zeros((N, 12)),
    )
    params = eng.SimParams()
    terr = eng.flat_terrain()
    target = jnp.tile(ddp, (N, 1))

    def run(restitution):
        dyn = eng.identity_dynamics_params(N)._replace(
            restitution=jnp.full((N,), restitution))

        def body(s, _):
            tau = 20.0 * (target - s.q) - 1.0 * s.qd
            s2, _ = eng.physics_substep(model, params, s, tau, dyn, terr)
            return s2, s2.base_lin_vel[:, 2]

        _, vz = jax.lax.scan(body, state, None, length=300)
        return np.asarray(vz)

    vz_bouncy = run(0.9)
    vz_dead = run(0.0)
    assert np.isfinite(vz_bouncy).all() and np.isfinite(vz_dead).all()
    impact = vz_bouncy.min()
    assert vz_bouncy.max() > 0.5 * abs(impact), (vz_bouncy.max(), impact)
    assert vz_dead.max() < 0.35, vz_dead.max()


def test_cached_substep_matches_exact():
    """Matrix-reuse mode must track the exact path closely over a control
    step horizon (the cache is rebuilt every 4 substeps in the env)."""
    import jax
    from walk_these_ways_tpu.go1_config import mob_train_cfg, GO1_DEFAULT_JOINT_ANGLES
    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    n = 3
    state = eng.PhysicsState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.30]), (n, 1)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        base_lin_vel=jnp.array([[0.3, 0.0, 0.0]] * n),
        base_ang_vel=jnp.array([[0.0, 0.0, 0.5]] * n),
        q=jnp.tile(ddp, (n, 1)),
        qd=jnp.zeros((n, 12)),
    )
    params = eng.SimParams()
    dyn = eng.identity_dynamics_params(n)
    terr = eng.flat_terrain()
    tau = 20.0 * (jnp.tile(ddp, (n, 1)) - state.q)

    s_exact = state
    s_cached = state
    for ctrl in range(5):          # 5 control steps of 4 substeps
        cache = eng.build_dynamics_cache(model, params, s_cached, dyn)
        p_cp = cache.p_cp
        for _ in range(4):
            tau_e = 20.0 * (jnp.tile(ddp, (n, 1)) - s_exact.q) - 0.5 * s_exact.qd
            s_exact, _ = eng.physics_substep(model, params, s_exact, tau_e,
                                             dyn, terr)
            tau_c = 20.0 * (jnp.tile(ddp, (n, 1)) - s_cached.q) - 0.5 * s_cached.qd
            s_cached, _, p_cp = eng.physics_substep_cached(
                model, params, s_cached, tau_c, dyn, terr, cache, p_cp)
    np.testing.assert_allclose(np.asarray(s_cached.base_pos),
                               np.asarray(s_exact.base_pos), atol=0.02)
    np.testing.assert_allclose(np.asarray(s_cached.q),
                               np.asarray(s_exact.q), atol=0.05)


def test_velocity_integrated_contact_points_track_fk():
    """Reuse mode advances contact points by p' = p + dt J qd instead of
    re-running FK (engine.physics_substep_cached); over one 4-substep
    control step the estimate must stay within the same O(dt^2) error
    budget as the matrix-reuse approximation itself."""
    import jax
    from walk_these_ways_tpu.models.robot import go1, default_dof_pos
    from walk_these_ways_tpu.go1_config import GO1_DEFAULT_JOINT_ANGLES

    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    n = 4
    rng = np.random.RandomState(5)
    state = eng.PhysicsState(
        base_pos=jnp.asarray([[0.0, 0.0, 0.4]] * n),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        base_lin_vel=jnp.asarray(0.5 * rng.randn(n, 3).astype(np.float32)),
        base_ang_vel=jnp.asarray(0.5 * rng.randn(n, 3).astype(np.float32)),
        q=jnp.tile(ddp, (n, 1)) + 0.1 * rng.randn(n, 12).astype(np.float32),
        qd=jnp.asarray(2.0 * rng.randn(n, 12).astype(np.float32)),
    )
    params = eng.SimParams()
    dyn = eng.identity_dynamics_params(n)
    terr = eng.flat_terrain()
    cache = eng.build_dynamics_cache(model, params, state, dyn)
    p_cp = cache.p_cp

    # anchor: estimate equals exact FK contact positions
    def fk_cp(st):
        frames = eng.forward_kinematics(model, st)
        cp_onehot = jnp.asarray(
            np.eye(model.nb, dtype=np.float32)[model.cp_body])
        Rb = jnp.einsum("pb,nbij->npij", cp_onehot, frames.R)
        pb = jnp.einsum("pb,nbi->npi", cp_onehot, frames.p)
        return pb + jnp.einsum(
            "npij,pj->npi", Rb, jnp.asarray(model.cp_offset, jnp.float32))

    np.testing.assert_allclose(np.asarray(p_cp), np.asarray(fk_cp(state)),
                               atol=1e-5)

    tau = jnp.zeros((n, 12))
    for _ in range(4):
        state, _, p_cp = eng.physics_substep_cached(
            model, params, state, tau, dyn, terr, cache, p_cp)
    err = np.abs(np.asarray(p_cp) - np.asarray(fk_cp(state))).max()
    assert err < 5e-3, f"contact point drift {err} m over one control step"


def test_foot_state_from_cache_matches_fk_at_anchor():
    from walk_these_ways_tpu.models.robot import go1, default_dof_pos
    from walk_these_ways_tpu.go1_config import GO1_DEFAULT_JOINT_ANGLES

    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    n = 3
    rng = np.random.RandomState(7)
    state = eng.PhysicsState(
        base_pos=jnp.asarray(rng.randn(n, 3).astype(np.float32) + [0, 0, 3]),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        base_lin_vel=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        base_ang_vel=jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        q=jnp.tile(ddp, (n, 1)) + 0.2 * rng.randn(n, 12).astype(np.float32),
        qd=jnp.asarray(rng.randn(n, 12).astype(np.float32)),
    )
    dyn = eng.identity_dynamics_params(n)
    cache = eng.build_dynamics_cache(model, eng.SimParams(), state, dyn)
    p_c, v_c = eng.foot_state_from_cache(model, cache, state, cache.p_cp)
    p_fk, v_fk = eng.foot_positions_velocities(model, state)
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_fk), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_fk), atol=1e-4)


def test_free_tumble_energy_bounded():
    """Regression for the round-4 seed-2 blowup (runs/seed2_blowup): a
    freely tumbling robot at |w| = 20 rad/s, zero torque, zero gravity.
    The explicit-Euler velocity-product update diverged to NaN here; the
    midpoint (RK2) evaluation must keep kinetic energy within a few
    percent over 1 s."""
    import dataclasses

    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    model = dataclasses.replace(
        model, dof_vel_limit=np.full(12, 1e9),      # no clamp assistance
        dof_lower=np.full(12, -1e9), dof_upper=np.full(12, 1e9),
        )                                           # no limit springs either
    params = dataclasses.replace(
        eng.SimParams(dt=0.005, use_pallas_contact=False),
        max_base_lin_vel=1e9, max_base_ang_vel=1e9)
    dyn = eng.DynamicsParams(
        payload=jnp.zeros(1), com_displacement=jnp.zeros((1, 3)),
        friction=jnp.ones(1), restitution=jnp.zeros(1),
        gravity=jnp.zeros((1, 3)))
    terr = eng.flat_terrain()
    ax = np.array([0.4, 0.7, 0.59])
    ax /= np.linalg.norm(ax)
    state = eng.PhysicsState(
        base_pos=jnp.array([[0.0, 0.0, 50.0]]),
        base_quat=jnp.array([[0.0, 0.0, 0.0, 1.0]]),
        base_lin_vel=jnp.zeros((1, 3)),
        base_ang_vel=jnp.asarray((20.0 * ax)[None], dtype=jnp.float32),
        q=jnp.asarray(ddp)[None], qd=jnp.zeros((1, 12)))

    def energy(st):
        frames = eng.forward_kinematics(model, st)
        Sw, Sv = eng.joint_twists(model, frames, st.base_pos)
        gv = jnp.concatenate(
            [st.base_ang_vel, st.base_lin_vel, st.qd], axis=-1)[0]
        blk = eng.inertia_blocks(model, frames, st.base_pos, dyn)
        M = eng.mass_matrix(model, Sw, Sv, blk)[0]
        return float(0.5 * gv @ M @ gv)

    step = jax.jit(lambda s: eng.physics_substep(
        model, params, s, jnp.zeros((1, 12), jnp.float32), dyn, terr)[0])
    e0 = energy(state)
    for _ in range(200):          # 1 s
        state = step(state)
    e1 = energy(state)
    assert np.isfinite(e1)
    assert e1 / e0 < 1.06, f"tumble energy grew {e1 / e0:.3f}x over 1 s"
