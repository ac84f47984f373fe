"""Multi-chip sharding correctness on the 8-device virtual CPU mesh.

The scale-out design (parallel/mesh.py): 1-D mesh over the env axis, env
state sharded on its leading dim, learner state replicated, GSPMD
propagating shardings and inserting the collectives (advantage
normalization, gradient reduction, curriculum scatter).  These tests pin:

(a) sharded env.step == single-device env.step,
(b) one sharded train iteration == the unsharded iteration (params
    allclose after the update),
(c) the full-config (Pallas contact) path executes on the mesh,
(d) an 8-device dryrun variant with a scaling-efficiency report.

conftest.py provisions XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from walk_these_ways_tpu.go1_config import mob_train_cfg, small_train_cfg
from walk_these_ways_tpu.learn import ppo as ppo_mod
from walk_these_ways_tpu.parallel import mesh as mesh_mod

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")

N = 32


def _env_and_states(cfg_fn=small_train_cfg):
    cfg = cfg_fn(num_envs=N)
    env = LeggedRobotEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    return env, state, obs


@pytest.mark.heavy
def test_sharded_step_matches_single_device():
    env, state, obs = _env_and_states()
    actions = jnp.asarray(
        0.3 * np.random.RandomState(0).randn(N, 12).astype(np.float32))

    step = jax.jit(env.step)
    s1, o1, r1, d1, _ = step(state, actions)

    mesh = mesh_mod.make_mesh(8)
    state_sh = mesh_mod.shard_env_state(state, mesh, N)
    with mesh:
        s2, o2, r2, d2, _ = step(state_sh, actions)

    np.testing.assert_allclose(np.asarray(s2.phys.base_pos),
                               np.asarray(s1.phys.base_pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.phys.q),
                               np.asarray(s1.phys.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2["obs"]), np.asarray(o1["obs"]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))
    # outputs actually live sharded on the env axis
    assert not s2.phys.base_pos.sharding.is_fully_replicated


@pytest.mark.heavy
def test_sharded_train_iteration_matches_single_device():
    env, state, obs = _env_and_states()
    ts = ppo_mod.init_train_state(jax.random.PRNGKey(1), env)
    it_fn = jax.jit(ppo_mod.make_train_iteration(env, num_steps=4))

    s1, o1, ts1, m1 = it_fn(state, obs, ts)

    mesh = mesh_mod.make_mesh(8)
    state_sh = mesh_mod.shard_env_state(state, mesh, N)
    obs_sh = mesh_mod.shard_env_state(obs, mesh, N)
    ts_sh = mesh_mod.replicate(ts, mesh)
    with mesh:
        s2, o2, ts2, m2 = it_fn(state_sh, obs_sh, ts_sh)

    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        # atol covers the cross-device psum reduction-order drift amplified
        # through 20 Adam steps (observed up to ~2e-4 on single params)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-3, atol=4e-4)
    np.testing.assert_allclose(float(m2.value_loss), float(m1.value_loss),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(float(m2.mean_kl), float(m1.mean_kl),
                               rtol=1e-2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2.ep_sums_done),
                               np.asarray(m1.ep_sums_done),
                               rtol=1e-4, atol=1e-4)
    # curriculum weights stay replicated and identical
    np.testing.assert_allclose(np.asarray(s2.curriculum.weights),
                               np.asarray(s1.curriculum.weights), atol=1e-6)


@pytest.mark.heavy
def test_full_config_pallas_step_on_mesh():
    """The flagship MoB config (Pallas contact pipeline) must execute on
    the mesh (interpret mode on CPU)."""
    env, state, obs = _env_and_states(mob_train_cfg)
    assert env.sim_params.use_pallas_contact
    actions = jnp.zeros((N, 12))
    mesh = mesh_mod.make_mesh(8)
    state_sh = mesh_mod.shard_env_state(state, mesh, N)
    step = jax.jit(env.step)
    with mesh:
        s2, o2, r2, d2, _ = step(state_sh, actions)
        jax.block_until_ready(r2)
    assert np.isfinite(np.asarray(r2)).all()


def test_scaling_dryrun_8dev():
    """4000-env 8-device dryrun of the full train iteration with a
    scaling-efficiency report (wall-clock is CPU-bound here; the report is
    informational, the assertion is correctness)."""
    num_envs = 256
    cfg = small_train_cfg(num_envs=num_envs)
    env = LeggedRobotEnv(cfg)
    ts = ppo_mod.init_train_state(jax.random.PRNGKey(2), env)
    state, obs = env.reset(jax.random.PRNGKey(3))
    it_fn = jax.jit(ppo_mod.make_train_iteration(env, num_steps=4))

    mesh = mesh_mod.make_mesh(8)
    state = mesh_mod.shard_env_state(state, mesh, num_envs)
    obs = mesh_mod.shard_env_state(obs, mesh, num_envs)
    ts = mesh_mod.replicate(ts, mesh)
    with mesh:
        state, obs, ts, m = it_fn(state, obs, ts)
        jax.block_until_ready(m.value_loss)
        t0 = time.time()
        state, obs, ts, m = it_fn(state, obs, ts)
        jax.block_until_ready(m.value_loss)
        dt = time.time() - t0
    assert np.isfinite(float(m.value_loss))
    assert np.isfinite(float(m.adaptation_loss))
    print(f"\n8-device dryrun: {4 * num_envs / dt:,.0f} env-steps/s "
          f"(virtual CPU mesh)")


@pytest.mark.heavy
def test_runner_with_mesh(tmp_path):
    """The Runner(mesh=...) path used by scripts/train.py --mesh: env
    state sharded on the env axis, learner replicated, full learn() loop
    (log + checkpoint + export) on the 8-device virtual mesh."""
    from walk_these_ways_tpu.learn.runner import Runner, RunnerArgs

    cfg = small_train_cfg(num_envs=16)
    env = LeggedRobotEnv(cfg)
    mesh = mesh_mod.make_mesh(8)
    runner = Runner(env, log_dir=str(tmp_path), seed=0,
                    args=RunnerArgs(num_steps_per_env=4, max_iterations=2,
                                    log_freq=2, save_interval=1000,
                                    curriculum_dump_freq=1000),
                    mesh=mesh)
    with mesh:
        runner.learn(num_learning_iterations=2)
    # env state actually lives sharded on the env axis
    sh = runner.env_state.phys.base_pos.sharding
    assert not sh.is_fully_replicated
    assert (tmp_path / "metrics.jsonl").exists()
    assert (tmp_path / ".charts.yml").exists()
    assert (tmp_path / "checkpoints" / "policy_latest.npz").exists()
