"""Whole-control-step Pallas kernel parity vs the per-substep pipeline.

ops/pallas_megastep.py folds the torque model, all decimation substeps
(dynamics + contact) and the base/joint integration into ONE kernel
launch with the J/W contact cache built in-kernel.  It must reproduce
the per-substep path (go1_env.step with sim.megastep=False: XLA torque
model + per-substep Pallas kernels), which is itself parity-tested
against the N-major XLA engine in tests/test_pallas_dynamics.py.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from walk_these_ways_tpu.go1_config import mob_train_cfg
from walk_these_ways_tpu.models import actuator_net
from walk_these_ways_tpu.ops import pallas_megastep as pm


def test_blockdiag_actuator_weights_match_reference_mlp():
    """The block-diagonal MXU formulation evaluates the same function as
    actuator_net.apply for all 12 joints at once."""
    params = actuator_net.load()
    rng = np.random.RandomState(3)
    B = 16
    feats = [jnp.asarray(rng.randn(12, B).astype(np.float32))
             for _ in range(6)]
    W0b, b0b, W1b, b1b, W2b, b2b = pm.blockdiag_actuator_weights(params)
    X = jnp.concatenate(feats, axis=0)                       # (72, B)

    def softsign(x):
        return x / (1.0 + jnp.abs(x))

    h = softsign(W0b @ X + b0b)
    h = softsign(W1b @ h + b1b)
    tau_blk = W2b @ h + b2b                                  # (12, B)

    # reference evaluation: (B, 12, 6) feature stack
    x_ref = jnp.stack([f.T for f in feats], axis=-1)         # (B, 12, 6)
    tau_ref = actuator_net.apply(params, x_ref)              # (B, 12)
    np.testing.assert_allclose(np.asarray(tau_blk.T), np.asarray(tau_ref),
                               rtol=1e-5, atol=1e-6)


def _envs(n, megastep_overrides, substep_overrides):
    base = mob_train_cfg(num_envs=n)
    # warm start is a megastep-only feature (validated separately in
    # test_warm_start.py); pin it off so both paths run the identical
    # cold-start iteration this parity test is about
    cfg_m = dataclasses.replace(
        base, sim=dataclasses.replace(base.sim, megastep=True,
                                      contact_warm_start=False),
        **megastep_overrides)
    cfg_s = dataclasses.replace(
        base, sim=dataclasses.replace(base.sim, megastep=False,
                                      contact_warm_start=False),
        **substep_overrides)
    return LeggedRobotEnv(cfg_m), LeggedRobotEnv(cfg_s)


def _run_and_compare(env_m, env_s, n, steps=3, atol_pos=1e-3, atol_q=2e-3):
    sm, _ = env_m.reset(jax.random.PRNGKey(0))
    ss, _ = env_s.reset(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    for k in range(steps):
        actions = jnp.asarray(0.4 * rng.randn(n, 12).astype(np.float32))
        sm, om, rm, dm, im = env_m.step(sm, actions)
        ss, os_, rs, ds, is_ = env_s.step(ss, actions)
    np.testing.assert_allclose(np.asarray(sm.phys.base_pos),
                               np.asarray(ss.phys.base_pos), atol=atol_pos)
    np.testing.assert_allclose(np.asarray(sm.phys.base_quat),
                               np.asarray(ss.phys.base_quat), atol=atol_pos)
    np.testing.assert_allclose(np.asarray(sm.phys.q),
                               np.asarray(ss.phys.q), atol=atol_q)
    np.testing.assert_allclose(np.asarray(sm.phys.qd),
                               np.asarray(ss.phys.qd), atol=5e-2)
    np.testing.assert_allclose(np.asarray(sm.torques),
                               np.asarray(ss.torques), atol=1e-2)
    np.testing.assert_allclose(np.asarray(sm.lag_buffer),
                               np.asarray(ss.lag_buffer), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sm.joint_pos_target),
                               np.asarray(ss.joint_pos_target), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sm.joint_pos_err_last),
                               np.asarray(ss.joint_pos_err_last), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sm.joint_vel_last),
                               np.asarray(ss.joint_vel_last), atol=5e-2)
    np.testing.assert_allclose(np.asarray(sm.foot_velocities),
                               np.asarray(ss.foot_velocities), atol=5e-2)
    np.testing.assert_allclose(np.asarray(sm.contact_forces),
                               np.asarray(ss.contact_forces),
                               rtol=1e-2, atol=2.0)
    np.testing.assert_allclose(np.asarray(rm), np.asarray(rs), atol=1e-2)
    return sm, ss


def test_megastep_matches_substep_actuator_net():
    """Mega-kernel control step == per-substep Pallas path on the full MoB
    config (actuator_net + lag buffer + DR), flat ground."""
    n = 8
    env_m, env_s = _envs(n, {}, {})
    assert env_m.cfg.sim.megastep and not env_s.cfg.sim.megastep
    _run_and_compare(env_m, env_s, n)


def test_megastep_matches_substep_p_control():
    """Mega-kernel with PD torques (control_type='P', no lag buffer)."""
    n = 8
    base = mob_train_cfg(num_envs=n)
    ctrl = dataclasses.replace(base.control, control_type="P")
    dr = dataclasses.replace(base.domain_rand,
                             randomize_lag_timesteps=False, lag_timesteps=0)
    cfg_m = dataclasses.replace(
        base, control=ctrl, domain_rand=dr,
        sim=dataclasses.replace(base.sim, megastep=True,
                                contact_warm_start=False))
    cfg_s = dataclasses.replace(
        cfg_m, sim=dataclasses.replace(cfg_m.sim, megastep=False))
    env_m, env_s = LeggedRobotEnv(cfg_m), LeggedRobotEnv(cfg_s)
    _run_and_compare(env_m, env_s, n)


def test_megastep_heightfield():
    """Mega-kernel on a rough heightfield (general surface normals in
    contact_core) == per-substep path."""
    n = 8
    base = mob_train_cfg(num_envs=n)
    terr = dataclasses.replace(
        base.terrain, mesh_type="heightfield", num_rows=2, num_cols=2,
        terrain_length=4.0, terrain_width=4.0,
        terrain_proportions=(0.0, 1.0, 0.0, 0.0, 0.0),
        teleport_robots=False, curriculum=False, center_robots=False)
    cfg_m = dataclasses.replace(
        base, terrain=terr,
        sim=dataclasses.replace(base.sim, megastep=True,
                                contact_warm_start=False))
    cfg_s = dataclasses.replace(
        cfg_m, sim=dataclasses.replace(cfg_m.sim, megastep=False))
    env_m, env_s = LeggedRobotEnv(cfg_m), LeggedRobotEnv(cfg_s)
    _run_and_compare(env_m, env_s, n, steps=2, atol_pos=2e-3, atol_q=4e-3)


def test_megastep_exact_mode():
    """Exact mode (reuse_matrices=False) on flat ground: the single-launch
    exact mega-kernel (full FK/CRBA/M^-1/J/W cache rebuilt from the
    current state before every substep, inside the kernel, on the
    sublane-split batch) == the per-substep kernel path."""
    n = 8
    base = mob_train_cfg(num_envs=n)
    base = dataclasses.replace(
        base, sim=dataclasses.replace(base.sim, reuse_matrices=False))
    cfg_m = dataclasses.replace(
        base, sim=dataclasses.replace(base.sim, megastep=True))
    cfg_s = dataclasses.replace(
        base, sim=dataclasses.replace(base.sim, megastep=False))
    env_m, env_s = LeggedRobotEnv(cfg_m), LeggedRobotEnv(cfg_s)
    _run_and_compare(env_m, env_s, n, steps=2)


def test_substep_targets_unroll_matches_sequential_shift():
    """_substep_targets reproduces the sequential lag-buffer shift of
    _compute_torques over one control step."""
    n = 4
    cfg = mob_train_cfg(num_envs=n)
    env = LeggedRobotEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(1))
    rng = np.random.RandomState(11)
    state = state._replace(
        actions=jnp.asarray(0.5 * rng.randn(n, 12).astype(np.float32)),
        lag_buffer=jnp.asarray(
            rng.randn(n, cfg.domain_rand.lag_timesteps + 1, 12)
            .astype(np.float32)))
    tgt, lag_final = env._substep_targets(state)

    st = state
    for s in range(cfg.control.decimation):
        _, target, lag, _ = env._compute_torques(st)
        st = st._replace(lag_buffer=lag, joint_pos_target=target)
        np.testing.assert_allclose(np.asarray(tgt[:, s]),
                                   np.asarray(target), atol=1e-6,
                                   err_msg=f"substep {s}")
    np.testing.assert_allclose(np.asarray(lag_final),
                               np.asarray(st.lag_buffer), atol=1e-6)
