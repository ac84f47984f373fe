"""Pallas contact pipeline parity vs the XLA solver (interpret mode, CPU).

The env-minor kernels in ops/pallas_contact.py must reproduce the XLA
reference path in physics/engine.py exactly (same math, same iteration
count): cache build (J, W) and the full substep (gaps, targets, PGS
iterations, impulse apply, point advance).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.go1_config import GO1_DEFAULT_JOINT_ANGLES
from walk_these_ways_tpu.models.robot import default_dof_pos, go1
from walk_these_ways_tpu.ops import pallas_contact as pc
from walk_these_ways_tpu.physics import engine as eng


def _contact_state(n):
    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    rng = np.random.RandomState(11)
    return model, eng.PhysicsState(
        base_pos=jnp.asarray(
            np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      rng.uniform(0.18, 0.32, n)], -1).astype(np.float32)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        base_lin_vel=jnp.asarray(0.4 * rng.randn(n, 3).astype(np.float32)),
        base_ang_vel=jnp.asarray(0.4 * rng.randn(n, 3).astype(np.float32)),
        q=jnp.tile(ddp, (n, 1)) + 0.1 * rng.randn(n, 12).astype(np.float32),
        qd=jnp.asarray(1.0 * rng.randn(n, 12).astype(np.float32)),
    )


def test_cache_kernel_matches_xla():
    n = 8
    model, state = _contact_state(n)
    dyn = eng.identity_dynamics_params(n)
    xla_params = eng.SimParams()
    pal_params = dataclasses.replace(xla_params, use_pallas_contact=True)
    c_x = eng.build_dynamics_cache(model, xla_params, state, dyn)
    c_p = eng.build_dynamics_cache(model, pal_params, state, dyn)
    J_t, W_t = c_p.pallas_ops.J_t, c_p.pallas_ops.W_t
    P = model.cp_body.shape[0]
    J_back = pc.from_env_minor(
        jnp.transpose(J_t, (0, 1, 2, 3)), n)        # (n, P, 3, nv)
    np.testing.assert_allclose(np.asarray(J_back), np.asarray(c_x.J),
                               rtol=1e-5, atol=1e-5)
    W_back = pc.from_env_minor(W_t, n).reshape(n, P, 3, 3)
    np.testing.assert_allclose(np.asarray(W_back), np.asarray(c_x.W),
                               rtol=2e-4, atol=2e-4)


def test_substep_kernel_matches_xla():
    n = 8
    model, state = _contact_state(n)
    dyn = eng.identity_dynamics_params(n)._replace(
        friction=jnp.asarray(np.random.RandomState(3).uniform(0.3, 2.0, n)
                             .astype(np.float32)),
        restitution=jnp.asarray(np.random.RandomState(4).uniform(0, 0.4, n)
                                .astype(np.float32)))
    terr = eng.flat_terrain()
    tau = jnp.asarray(
        5.0 * np.random.RandomState(5).randn(n, 12).astype(np.float32))

    xla_params = eng.SimParams()
    pal_params = dataclasses.replace(xla_params, use_pallas_contact=True)
    c_x = eng.build_dynamics_cache(model, xla_params, state, dyn)
    c_p = eng.build_dynamics_cache(model, pal_params, state, dyn)

    s_x, cinfo_x, pcp_x = eng.physics_substep_cached(
        model, xla_params, state, tau, dyn, terr, c_x)
    s_p, lam_t, pcp_t = eng.physics_substep_cached(
        model, pal_params, state, tau, dyn, terr, c_p)

    for a, b in zip(s_x, s_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-4)
    cinfo_p = eng.contact_report_from_lam_t(model, lam_t, xla_params.dt, n)
    np.testing.assert_allclose(np.asarray(cinfo_p.report_forces),
                               np.asarray(cinfo_x.report_forces),
                               rtol=1e-3, atol=0.5)
    # carried point estimates agree (XLA advances with clamped velocities,
    # the kernel with pre-clamp ones — inactive clamps => equal)
    np.testing.assert_allclose(np.asarray(pc.from_env_minor(pcp_t, n)),
                               np.asarray(pcp_x), rtol=1e-4, atol=1e-4)


def test_env_step_pallas_matches_xla():
    """Full env.step parity: pallas config vs default reuse config."""
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.go1_config import mob_train_cfg

    n = 8
    base = mob_train_cfg(num_envs=n)
    # pin the cold-start solver on both sides: warm start is a
    # megastep-only feature (validated in test_warm_start.py) and the XLA
    # reference side always cold-starts
    cfg_p = dataclasses.replace(
        base, sim=dataclasses.replace(base.sim, contact_warm_start=False))
    # (explicitly force the XLA solver for the reference side — the MoB
    # config defaults to the Pallas path, so without this the test would
    # compare pallas against itself)
    cfg = dataclasses.replace(
        cfg_p, sim=dataclasses.replace(cfg_p.sim, use_pallas_contact=False))
    env_x = LeggedRobotEnv(cfg)
    env_p = LeggedRobotEnv(cfg_p)
    assert env_p.sim_params.use_pallas_contact
    assert not env_x.sim_params.use_pallas_contact

    sx, ox = env_x.reset(jax.random.PRNGKey(0))
    sp, op = env_p.reset(jax.random.PRNGKey(0))
    actions = jnp.asarray(
        0.3 * np.random.RandomState(9).randn(n, 12).astype(np.float32))
    for _ in range(5):
        sx, ox, rx, dx, ix = env_x.step(sx, actions)
        sp, op, rp, dp, ip = env_p.step(sp, actions)
    np.testing.assert_allclose(np.asarray(sp.phys.base_pos),
                               np.asarray(sx.phys.base_pos), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sp.phys.q),
                               np.asarray(sx.phys.q), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rx), atol=2e-2)
