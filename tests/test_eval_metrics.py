"""Eval metrics library tests."""
import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.go1_config import small_train_cfg
from conftest import xla_physics
from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from walk_these_ways_tpu.learn import eval_metrics as em
from walk_these_ways_tpu.models import actor_critic as ac


def test_metrics_shapes_and_finiteness():
    cfg = xla_physics(small_train_cfg(num_envs=4))
    env = LeggedRobotEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    params = ac.init(jax.random.PRNGKey(1), env.num_obs,
                     env.num_privileged_obs, env.num_obs_history,
                     env.num_actions)
    for name, fn in em.METRICS_FNS.items():
        out = fn(env, state, params, obs)
        if name == "auxiliary_rewards":
            # dict of per-term scaled rewards (reference metrics.py:66-73)
            assert set(out) == set(env.reward_names)
            for term, v in out.items():
                v = np.asarray(v)
                assert v.shape == (4,), (term, v.shape)
                assert np.isfinite(v).all(), term
            continue
        out = np.asarray(out)
        if name in ("privileged_obs", "latents"):
            # per-env vectors (reference metrics.py:79-84)
            assert out.shape == (4, env.num_privileged_obs), (name, out.shape)
        else:
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
    cfg = xla_physics(small_train_cfg(num_envs=4))
    env = LeggedRobotEnv(cfg)
    params = ac.init(jax.random.PRNGKey(1), env.num_obs,
                     env.num_privileged_obs, env.num_obs_history,
                     env.num_actions)
    out = em.evaluate_policy(env, params, jax.random.PRNGKey(2), num_steps=3)
    assert set(out) == {"lin_vel_rmsd", "ang_vel_rmsd", "power_consumption",
                        "cost_of_transport"}
    assert all(np.isfinite(v) for v in out.values())
