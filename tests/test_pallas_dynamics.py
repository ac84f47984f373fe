"""Env-minor dynamics-cache + full-substep-kernel parity vs the N-major
XLA reference path.

physics/envminor.py recomputes FK / twist bases / spatial inertia / CRBA /
M^-1 in scalar-per-env form; ops/pallas_dynamics.py moves the per-substep
twists/bias/qdd into the contact kernel.  Both must reproduce
physics/engine.py's N-major implementations (the exact-mode reference
path) to float tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.go1_config import GO1_DEFAULT_JOINT_ANGLES
from walk_these_ways_tpu.models.robot import default_dof_pos, go1
from walk_these_ways_tpu.ops import pallas_contact as pc
from walk_these_ways_tpu.physics import engine as eng
from walk_these_ways_tpu.physics import envminor as em


def _state(n, seed=11):
    model = go1()
    ddp = default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES))
    rng = np.random.RandomState(seed)
    quat = rng.randn(n, 4).astype(np.float32)
    quat[:, :3] *= 0.1
    quat[:, 3] = np.abs(quat[:, 3]) + 1.0
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    return model, eng.PhysicsState(
        base_pos=jnp.asarray(
            np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      rng.uniform(0.18, 0.32, n)], -1).astype(np.float32)),
        base_quat=jnp.asarray(quat),
        base_lin_vel=jnp.asarray(0.4 * rng.randn(n, 3).astype(np.float32)),
        base_ang_vel=jnp.asarray(0.4 * rng.randn(n, 3).astype(np.float32)),
        q=jnp.tile(ddp, (n, 1)) + 0.1 * rng.randn(n, 12).astype(np.float32),
        qd=jnp.asarray(1.0 * rng.randn(n, 12).astype(np.float32)),
    )


def _randomized_dyn(model, n):
    rng = np.random.RandomState(7)
    dyn = eng.identity_dynamics_params(n)
    return dyn._replace(
        payload=jnp.asarray(rng.uniform(-0.5, 2.0, n).astype(np.float32)),
        com_displacement=jnp.asarray(
            0.05 * rng.randn(n, 3).astype(np.float32)),
        friction=jnp.asarray(rng.uniform(0.3, 2.0, n).astype(np.float32)),
        restitution=jnp.asarray(rng.uniform(0, 0.4, n).astype(np.float32)),
    )


def test_envminor_cache_matches_nmajor():
    """Sw/Sv/M^-1/inertia blocks/contact points from the scalar-per-env
    build equal the N-major engine chain (engine.py:556-612)."""
    n = 8
    model, state = _state(n)
    dyn = _randomized_dyn(model, n)

    frames = eng.forward_kinematics(model, state)
    ref = state.base_pos
    Sw, Sv = eng.joint_twists(model, frames, ref)
    blk = eng.inertia_blocks(model, frames, ref, dyn)
    M = eng.mass_matrix(model, Sw, Sv, blk)
    M = M + 1e-7 * jnp.eye(model.nv, dtype=M.dtype)[None]
    Minv = eng._mass_matrix_inverse(model, M)

    c = em.build_cache_envminor(model, state, dyn, block=256)
    np.testing.assert_allclose(np.asarray(pc.from_env_minor(c.Sw_t, n)),
                               np.asarray(Sw), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pc.from_env_minor(c.Sv_t, n)),
                               np.asarray(Sv), rtol=1e-5, atol=1e-5)
    A_back = pc.from_env_minor(c.A_t, n).reshape(n, model.nb, 3, 3)
    B_back = pc.from_env_minor(c.B_t, n).reshape(n, model.nb, 3, 3)
    np.testing.assert_allclose(np.asarray(A_back), np.asarray(blk.A),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(B_back), np.asarray(blk.B),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pc.from_env_minor(c.m_t, n)),
                               np.asarray(blk.m), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pc.from_env_minor(c.Minv_t, n)),
                               np.asarray(Minv), rtol=2e-3, atol=2e-4)
    # contact points match the one-hot FK gather
    P = model.cp_body.shape[0]
    cp_onehot = jnp.asarray(
        np.eye(model.nb, dtype=np.float32)[model.cp_body])
    Rb = jnp.einsum("pb,nbij->npij", cp_onehot, frames.R)
    pb = jnp.einsum("pb,nbi->npi", cp_onehot, frames.p)
    p_cp = pb + jnp.einsum("npij,pj->npi", Rb,
                           jnp.asarray(model.cp_offset, jnp.float32))
    np.testing.assert_allclose(np.asarray(pc.from_env_minor(c.p_cp_t, n)),
                               np.asarray(p_cp), rtol=1e-5, atol=1e-5)


def test_full_substep_kernel_matches_xla_dynamics():
    """The dynamics preamble (twists + bias + qdd) moved into the Pallas
    substep kernel must reproduce engine.physics_substep_cached's XLA
    path end-to-end, including under randomized payload/com/gravity DR."""
    n = 8
    model, state = _state(n, seed=13)
    dyn = _randomized_dyn(model, n)
    rng = np.random.RandomState(21)
    dyn = dyn._replace(gravity=jnp.asarray(
        (np.array([0.0, 0.0, -9.81]) + 0.3 * rng.randn(n, 3))
        .astype(np.float32)))
    terr = eng.flat_terrain()
    tau = jnp.asarray(5.0 * rng.randn(n, 12).astype(np.float32))

    xla_params = eng.SimParams()
    pal_params = dataclasses.replace(xla_params, use_pallas_contact=True)
    c_x = eng.build_dynamics_cache(model, xla_params, state, dyn)
    c_p = eng.build_dynamics_cache(model, pal_params, state, dyn)

    s_x, _, pcp_x = eng.physics_substep_cached(
        model, xla_params, state, tau, dyn, terr, c_x)
    s_p, _, pcp_t = eng.physics_substep_cached(
        model, pal_params, state, tau, dyn, terr, c_p)
    for name, a, b in zip(s_x._fields, s_x, s_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(pc.from_env_minor(pcp_t, n)),
                               np.asarray(pcp_x), rtol=1e-4, atol=1e-4)


def test_substep_kernel_contact_disabled():
    """contact=False in the kernel == free dynamics (XLA path with
    contact_enabled=False)."""
    n = 4
    model, state = _state(n, seed=17)
    dyn = eng.identity_dynamics_params(n)
    terr = eng.flat_terrain()
    tau = jnp.asarray(
        3.0 * np.random.RandomState(2).randn(n, 12).astype(np.float32))
    base = eng.SimParams()
    xla_params = dataclasses.replace(base, contact_enabled=False)
    pal_params = dataclasses.replace(base, contact_enabled=False,
                                     use_pallas_contact=True)
    c_x = eng.build_dynamics_cache(model, xla_params, state, dyn)
    c_p = eng.build_dynamics_cache(model, pal_params, state, dyn)
    s_x, _, _ = eng.physics_substep_cached(
        model, xla_params, state, tau, dyn, terr, c_x)
    s_p, _, _ = eng.physics_substep_cached(
        model, pal_params, state, tau, dyn, terr, c_p)
    for name, a, b in zip(s_x._fields, s_x, s_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-4, err_msg=name)


def test_env_step_exact_pallas_matches_exact_xla():
    """Exact mode (reuse_matrices=False: fresh FK/CRBA/M^-1/J per substep)
    on the Pallas pipeline == the exact XLA path (engine.physics_substep),
    full env.step."""
    import jax
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.go1_config import mob_train_cfg

    n = 8
    base = mob_train_cfg(num_envs=n)
    cfg_p = dataclasses.replace(
        base, sim=dataclasses.replace(base.sim, reuse_matrices=False,
                                      use_pallas_contact=True))
    cfg_x = dataclasses.replace(
        cfg_p, sim=dataclasses.replace(cfg_p.sim, use_pallas_contact=False))
    env_p = LeggedRobotEnv(cfg_p)
    env_x = LeggedRobotEnv(cfg_x)
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


def _rough_cfg(n, reuse):
    from walk_these_ways_tpu.config import TerrainCfg
    from walk_these_ways_tpu.go1_config import mob_train_cfg

    cfg = mob_train_cfg(num_envs=n)
    terr = dataclasses.replace(
        cfg.terrain, mesh_type="heightfield", num_rows=2, num_cols=2,
        terrain_length=4.0, terrain_width=4.0,
        terrain_proportions=(0.0, 1.0, 0.0, 0.0, 0.0),  # rough slope tiles
        teleport_robots=False, curriculum=False, center_robots=False)
    # warm start is a megastep-only feature; the XLA comparison side always
    # runs the full cold iteration count, so pin it off for a like-for-like
    # Pallas-vs-XLA closeness comparison (the warm count itself is
    # validated separately: tests/test_warm_start.py + runs/validate_warm3)
    return dataclasses.replace(
        cfg, terrain=terr,
        sim=dataclasses.replace(cfg.sim, reuse_matrices=reuse,
                                contact_warm_start=False,
                                contact_cross_step_warm_start=False))


def test_env_step_heightfield_exact_pallas_matches_xla():
    """Heightfield terrain on the Pallas pipeline (general surface
    normals, per-substep h/n sampling in exact mode) == the exact XLA
    path with the same terrain."""
    import jax
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv

    n = 8
    cfg_p = _rough_cfg(n, reuse=False)
    cfg_x = dataclasses.replace(
        cfg_p, sim=dataclasses.replace(cfg_p.sim, use_pallas_contact=False))
    env_p = LeggedRobotEnv(cfg_p)
    env_x = LeggedRobotEnv(cfg_x)
    assert env_p.sim_params.use_pallas_contact
    assert env_p.terrain.height.shape != (2, 2), "terrain must be rough"

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


def test_env_step_heightfield_reuse_pallas_close_to_xla():
    """Reuse mode on heightfield: the Pallas path samples h/n once per
    control step at the anchor geometry (the XLA reuse path re-samples at
    the carried points each substep) — same first-order-in-dt
    approximation class, so trajectories stay close over a few steps."""
    import jax
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv

    n = 8
    cfg_p = _rough_cfg(n, reuse=True)
    cfg_x = dataclasses.replace(
        cfg_p, sim=dataclasses.replace(cfg_p.sim, use_pallas_contact=False))
    env_p = LeggedRobotEnv(cfg_p)
    env_x = LeggedRobotEnv(cfg_x)
    assert env_p.sim_params.use_pallas_contact

    sx, ox = env_x.reset(jax.random.PRNGKey(0))
    sp, op = env_p.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((n, 12))
    for _ in range(3):
        sx, ox, rx, dx, ix = env_x.step(sx, actions)
        sp, op, rp, dp, ip = env_p.step(sp, actions)
    np.testing.assert_allclose(np.asarray(sp.phys.base_pos),
                               np.asarray(sx.phys.base_pos), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sp.phys.q),
                               np.asarray(sx.phys.q), atol=5e-2)
