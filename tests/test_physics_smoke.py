"""Physics engine sanity: FK geometry, PD standing equilibrium, contact forces.

Oracle values come from the reference robot geometry (go1.urdf kinematic
offsets) and basic mechanics (total weight supported at rest).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walk_these_ways_tpu.models.robot import go1, default_dof_pos
from walk_these_ways_tpu.physics import engine as eng
from walk_these_ways_tpu.go1_config import GO1_DEFAULT_JOINT_ANGLES

N = 4


@pytest.fixture(scope="module")
def setup():
    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    state = eng.PhysicsState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.32]), (N, 1)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1)),
        base_lin_vel=jnp.zeros((N, 3)),
        base_ang_vel=jnp.zeros((N, 3)),
        q=jnp.tile(ddp, (N, 1)),
        qd=jnp.zeros((N, 12)),
    )
    return model, ddp, state


def test_fk_feet_below_base(setup):
    model, ddp, state = setup
    p_foot, v_foot = eng.foot_positions_velocities(model, state)
    p = np.asarray(p_foot[0])
    # four feet, below the base, roughly symmetric x/y
    assert p.shape == (4, 3)
    assert (p[:, 2] < 0.1).all()
    # FL, FR, RL, RR ordering: x sign ++--, y sign +-+-
    assert p[0, 0] > 0 and p[1, 0] > 0 and p[2, 0] < 0 and p[3, 0] < 0
    assert p[0, 1] > 0 and p[1, 1] < 0 and p[2, 1] > 0 and p[3, 1] < 0
    np.testing.assert_allclose(np.asarray(v_foot), 0.0, atol=1e-5)


def test_mass_matrix_spd(setup):
    model, ddp, state = setup
    frames = eng.forward_kinematics(model, state)
    Sw, Sv = eng.joint_twists(model, frames, state.base_pos)
    dyn = eng.identity_dynamics_params(N)
    blk = eng.inertia_blocks(model, frames, state.base_pos, dyn)
    M = np.asarray(eng.mass_matrix(model, Sw, Sv, blk))
    assert M.shape == (N, 18, 18)
    np.testing.assert_allclose(M, np.swapaxes(M, -1, -2), atol=1e-4)
    eigs = np.linalg.eigvalsh(M[0])
    assert eigs.min() > 0
    # translational block = total mass * I3
    np.testing.assert_allclose(M[0, 3:6, 3:6], model.mass.sum() * np.eye(3),
                               atol=1e-3)


def test_mass_matrix_against_dense_oracle(setup):
    """Cross-validate the block CRBA against a brute-force dense 6x6
    spatial-inertia implementation (the identity
    M_ij = sum_b anc_i anc_j S_i^T I_b S_j)."""
    model, ddp, state = setup
    # use a non-trivial pose
    import jax
    q = state.q + 0.2 * jax.random.normal(jax.random.PRNGKey(3), state.q.shape)
    quat = jnp.tile(jnp.array([0.2, -0.1, 0.3, 0.95]), (N, 1))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    st = state._replace(q=q, base_quat=quat)
    frames = eng.forward_kinematics(model, st)
    dyn = eng.identity_dynamics_params(N)
    Sw, Sv = eng.joint_twists(model, frames, st.base_pos)
    blk = eng.inertia_blocks(model, frames, st.base_pos, dyn)
    M = np.asarray(eng.mass_matrix(model, Sw, Sv, blk))

    # dense oracle
    A, B, m = np.asarray(blk.A), np.asarray(blk.B), np.asarray(blk.m)
    S6 = np.concatenate([np.asarray(Sw), np.asarray(Sv)], axis=-1)  # (N,nv,6)
    I6 = np.zeros((N, model.nb, 6, 6))
    I6[..., :3, :3] = A
    I6[..., :3, 3:] = B
    I6[..., 3:, :3] = np.swapaxes(B, -1, -2)
    I6[..., 3:, 3:] = m[..., None, None] * np.eye(3)
    anc = model.anc_dof_body
    M_ref = np.einsum("ib,jb,nik,nbkl,njl->nij", anc, anc, S6, I6, S6)
    np.testing.assert_allclose(M, M_ref, rtol=1e-4, atol=1e-4)


def test_pd_stand(setup):
    """Robot under PD control to the default pose must settle standing."""
    model, ddp, state = setup
    params = eng.SimParams()
    dyn = eng.identity_dynamics_params(N)
    terr = eng.flat_terrain()
    target = jnp.tile(ddp, (N, 1))

    def substep(s, _):
        tau = 20.0 * (target - s.q) - 0.5 * s.qd
        s2, ci = eng.physics_substep(model, params, s, tau, dyn, terr)
        return s2, ci

    run = jax.jit(lambda s: jax.lax.scan(substep, s, None, length=400))
    s, cis = run(state)
    z = float(s.base_pos[0, 2])
    assert 0.2 < z < 0.4, f"standing height {z}"
    assert float(jnp.linalg.norm(s.base_lin_vel[0])) < 0.1
    # feet support the robot's weight
    fz = float(cis.foot_forces[-1][0, :, 2].sum())
    weight = model.mass.sum() * 9.81
    assert abs(fz - weight) / weight < 0.25, f"support {fz} vs weight {weight}"
    # joints near default pose
    assert float(jnp.abs(s.q[0] - ddp).max()) < 0.3


def test_free_fall(setup):
    """With no contacts (high drop) the base accelerates at g."""
    model, ddp, state = setup
    state = state._replace(base_pos=state.base_pos + jnp.array([0.0, 0.0, 10.0]))
    params = eng.SimParams()
    dyn = eng.identity_dynamics_params(N)
    terr = eng.flat_terrain()

    def substep(s, _):
        s2, ci = eng.physics_substep(model, params, s, jnp.zeros((N, 12)), dyn, terr)
        return s2, None

    run = jax.jit(lambda s: jax.lax.scan(substep, s, None, length=20))
    s, _ = run(state)
    t = 20 * params.dt
    vz = float(s.base_lin_vel[0, 2])
    np.testing.assert_allclose(vz, -9.81 * t, rtol=0.05)
