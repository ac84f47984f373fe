"""Eval metrics library tests."""
import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.go1_config import small_train_cfg
from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from walk_these_ways_tpu.learn import eval_metrics as em
from walk_these_ways_tpu.models import actor_critic as ac


def test_metrics_shapes_and_finiteness():
    cfg = small_train_cfg(num_envs=4)
    env = LeggedRobotEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    params = ac.init(jax.random.PRNGKey(1), env.num_obs,
                     env.num_privileged_obs, env.num_obs_history,
                     env.num_actions)
    for name, fn in em.METRICS_FNS.items():
        out = np.asarray(fn(env, state, params, obs))
        assert out.shape == (4,), (name, out.shape)
        assert np.isfinite(out).all(), name


def test_dr_settings_complete():
    # same preset names as the reference DR_SETTINGS
    for k in ("rand_regular", "rand_large", "static_low", "static_medium",
              "static_high", "only_base_mass"):
        assert k in em.DR_SETTINGS
        dr = em.DR_SETTINGS[k]
        assert dr.friction_range[0] <= dr.friction_range[1]


def test_evaluate_policy_runs():
    cfg = small_train_cfg(num_envs=4)
    env = LeggedRobotEnv(cfg)
    params = ac.init(jax.random.PRNGKey(1), env.num_obs,
                     env.num_privileged_obs, env.num_obs_history,
                     env.num_actions)
    out = em.evaluate_policy(env, params, jax.random.PRNGKey(2), num_steps=3)
    assert set(out) == {"lin_vel_rmsd", "ang_vel_rmsd", "power_consumption",
                        "cost_of_transport"}
    assert all(np.isfinite(v) for v in out.values())
