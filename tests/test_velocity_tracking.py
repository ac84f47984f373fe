"""VelocityTrackingEasyEnv adapter: reference extras-dict parity.

Reference go1_gym/envs/go1/velocity_tracking/__init__.py:22-49 returns
(obs, rew, reset, extras) with 13 diagnostic keys; the adapter must
produce the same key set with the same shapes/semantics, sourced from
EnvState.
"""
import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from walk_these_ways_tpu.go1_config import mob_train_cfg
from conftest import xla_physics
from walk_these_ways_tpu.ops import quat as qops
from walk_these_ways_tpu.velocity_tracking import VelocityTrackingEasyEnv

REFERENCE_KEYS = {
    "privileged_obs", "joint_pos", "joint_vel", "joint_pos_target",
    "joint_vel_target", "body_linear_vel", "body_angular_vel",
    "body_linear_vel_cmd", "body_angular_vel_cmd", "contact_states",
    "foot_positions", "body_pos", "torques",
}


def _env(n=4):
    return VelocityTrackingEasyEnv(
        LeggedRobotEnv(xla_physics(mob_train_cfg(num_envs=n))))


def test_step_returns_reference_extras():
    env = _env()
    obs = env.reset()
    assert set(obs) == {"obs", "privileged_obs", "obs_history"}
    acts = jnp.zeros((env.num_envs, env.num_actions))
    obs, rew, done, extras = env.step(acts)
    assert REFERENCE_KEYS <= set(extras)
    n = env.num_envs
    assert extras["joint_pos"].shape == (n, 12)
    assert extras["joint_vel"].shape == (n, 12)
    assert extras["joint_pos_target"].shape == (n, 12)
    assert extras["body_linear_vel"].shape == (n, 3)
    assert extras["body_angular_vel"].shape == (n, 3)
    assert extras["body_linear_vel_cmd"].shape == (n, 2)
    assert extras["body_angular_vel_cmd"].shape[0] == n
    assert extras["contact_states"].shape == (n, 4)
    assert extras["contact_states"].dtype == bool
    assert extras["foot_positions"].shape == (n, 4, 3)
    assert extras["body_pos"].shape == (n, 3)
    assert extras["torques"].shape == (n, 12)
    assert rew.shape == (n,) and done.shape == (n,)
    for k in ("joint_pos", "body_pos", "torques"):
        assert np.isfinite(extras[k]).all()


def test_extras_match_env_state():
    env = _env()
    env.reset()
    acts = 0.1 * jnp.ones((env.num_envs, env.num_actions))
    _, _, _, extras = env.step(acts)
    s = env.state
    np.testing.assert_allclose(extras["joint_pos"], np.asarray(s.phys.q),
                               rtol=1e-6)
    np.testing.assert_allclose(extras["body_pos"],
                               np.asarray(s.phys.base_pos), rtol=1e-6)
    want = qops.quat_rotate_inverse(s.phys.base_quat, s.phys.base_lin_vel)
    np.testing.assert_allclose(extras["body_linear_vel"], np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        extras["contact_states"],
        np.asarray(s.contact_forces[:, list(env.env.feet_indices), 2] > 1.0))
