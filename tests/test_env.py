"""Environment behavior tests against reference semantics oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walk_these_ways_tpu.go1_config import mob_train_cfg, small_train_cfg
from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from conftest import xla_physics


@pytest.fixture(scope="module")
def env_and_state():
    cfg = xla_physics(mob_train_cfg(num_envs=4))
    env = LeggedRobotEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    return env, state, obs


def test_obs_layout(env_and_state):
    """Train-config obs = 70 = 3 gravity + 15 cmds + 12 q + 12 qd + 12 a +
    12 last_a + 4 clock (SURVEY.md §2.1 / legged_robot.py:302-372)."""
    env, state, obs = env_and_state
    assert obs["obs"].shape == (4, 70)
    assert obs["privileged_obs"].shape == (4, 2)
    assert obs["obs_history"].shape == (4, 30 * 70)
    # obs history's last chunk is the current obs
    np.testing.assert_allclose(
        np.asarray(obs["obs_history"][:, -70:]), np.asarray(obs["obs"]))


def test_priv_obs_encodes_friction_restitution(env_and_state):
    """Privileged obs = scaled (friction, restitution) (train.py:78,
    legged_robot.py:383-414 with normalization ranges [0,1])."""
    env, state, obs = env_and_state
    fr = np.asarray(state.friction_coeffs)
    re = np.asarray(state.restitutions)
    expect = np.stack([(fr - 0.5) * 2.0, (re - 0.5) * 2.0], axis=-1)
    np.testing.assert_allclose(np.asarray(obs["privileged_obs"]), expect,
                               atol=1e-5)


def test_command_resample_zeroes_small_vels(env_and_state):
    env, state, obs = env_and_state
    cmds = np.asarray(state.commands)
    norms = np.linalg.norm(cmds[:, :2], axis=-1)
    assert ((norms == 0) | (norms > 0.2)).all()


def test_gait_clock_trot_phase_opposition():
    """For a trot command (phase 0.5, offset/bound 0) diagonal feet share
    the clock: FL==RR, FR==RL, opposite pairs (legged_robot.py:826-861)."""
    cfg = mob_train_cfg(num_envs=2)
    env = LeggedRobotEnv(xla_physics(cfg))
    state, obs = env.reset(jax.random.PRNGKey(0))
    cmd = np.zeros((2, 15), np.float32)
    cmd[:, 4] = 3.0   # freq
    cmd[:, 5] = 0.5   # phase (trot)
    cmd[:, 8] = 0.5   # duration
    state = state._replace(commands=jnp.asarray(cmd))
    step = jax.jit(env.step)
    for _ in range(5):
        state, obs, rew, done, info = step(state, jnp.zeros((2, 12)))
        # guard: resampling may overwrite commands on reset; re-pin
        state = state._replace(commands=jnp.asarray(cmd))
    clock = np.asarray(state.clock_inputs)
    np.testing.assert_allclose(clock[:, 0], clock[:, 3], atol=1e-5)  # FL==RR
    np.testing.assert_allclose(clock[:, 1], clock[:, 2], atol=1e-5)  # FR==RL
    np.testing.assert_allclose(clock[:, 0], -clock[:, 1], atol=1e-5)
    des = np.asarray(state.desired_contact_states)
    np.testing.assert_allclose(des[:, 0], des[:, 3], atol=1e-5)


def test_auto_reset_on_fall():
    """A robot flipped onto its back must terminate (base contact force,
    legged_robot.py:141-142 / terminal body height, train.py:110-111) and
    auto-reset with episode_length back to 0."""
    cfg = mob_train_cfg(num_envs=2)
    env = LeggedRobotEnv(xla_physics(cfg))
    state, obs = env.reset(jax.random.PRNGKey(0))
    flipped = state.phys._replace(
        base_pos=state.phys.base_pos.at[:, 2].set(0.08),
        base_quat=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (2, 1)),
        base_lin_vel=jnp.zeros((2, 3)), base_ang_vel=jnp.zeros((2, 3)),
        qd=jnp.zeros((2, 12)))
    state = state._replace(phys=flipped)
    step = jax.jit(env.step)
    saw_done = np.zeros(2, bool)
    for _ in range(25):
        state, obs, rew, done, info = step(state, jnp.zeros((2, 12)))
        saw_done |= np.asarray(done)
        if saw_done.all():
            break
    assert saw_done.all(), "flipped robots never terminated"
    # after the reset the pose is upright again
    assert (np.asarray(state.phys.base_pos[:, 2]) > 0.1).all()


def test_episode_timeout():
    cfg = small_train_cfg(num_envs=2)
    env = LeggedRobotEnv(xla_physics(cfg))
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = state._replace(
        episode_length=jnp.full((2,), env.max_episode_length, jnp.int32))
    state, obs, rew, done, info = jax.jit(env.step)(
        state, jnp.zeros((2, 12)))
    assert bool(done.all())
    assert bool(info.time_outs.all())


def test_rewards_finite_and_ji22_nonnegative():
    """only_positive_rewards_ji22_style: total = pos * exp(neg/sigma) >= 0
    (legged_robot.py:286-287)."""
    cfg = mob_train_cfg(num_envs=4)
    env = LeggedRobotEnv(xla_physics(cfg))
    state, obs = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    rng = jax.random.PRNGKey(3)
    for i in range(10):
        rng, k = jax.random.split(rng)
        a = jax.random.normal(k, (4, 12))
        state, obs, rew, done, info = step(state, a)
        r = np.asarray(rew)
        assert np.isfinite(r).all()
        assert (r >= 0).all()


def test_determinism_same_seed():
    cfg = small_train_cfg(num_envs=4)
    env = LeggedRobotEnv(xla_physics(cfg))

    def rollout(seed):
        state, obs = env.reset(jax.random.PRNGKey(seed))
        step = jax.jit(env.step)
        outs = []
        for i in range(5):
            state, obs, rew, done, info = step(
                state, 0.05 * jnp.ones((4, 12)))
            outs.append(np.asarray(rew))
        return np.stack(outs)

    a = rollout(7)
    b = rollout(7)
    np.testing.assert_array_equal(a, b)
    c = rollout(8)
    assert not np.array_equal(a, c)


def test_active_terms_raises_on_unimplemented_scale():
    """A nonzero reward scale with no implementation must fail loudly
    (stricter than the reference's printed warning,
    legged_robot.py:1405-1408)."""
    import dataclasses
    import pytest
    from walk_these_ways_tpu.envs import rewards as rew_mod
    from walk_these_ways_tpu.go1_config import mob_train_cfg

    cfg = mob_train_cfg(num_envs=4)
    bad = dataclasses.replace(cfg.reward_scales, feet_air_time=1.0)
    cfg = dataclasses.replace(cfg, reward_scales=bad)
    with pytest.raises(NotImplementedError, match="feet_air_time"):
        rew_mod.active_terms(cfg)


def test_vec_env_adapter_parity(env_and_state):
    """The gym-style adapter (reference vec_env.py:10-39 +
    history_wrapper.py:18-41 API) must produce the same trajectory as the
    functional interface it wraps."""
    from walk_these_ways_tpu.envs.wrappers import VecEnvAdapter

    env, _, _ = env_and_state
    adapter = VecEnvAdapter(env, seed=5)
    obs_a = adapter.reset()
    assert adapter.num_envs == env.num_envs
    assert adapter.num_train_envs + adapter.num_eval_envs == env.num_envs
    assert adapter.get_observations() is obs_a

    state_f, obs_f = env.reset(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(obs_a["obs"]),
                                  np.asarray(obs_f["obs"]))
    step = jax.jit(env.step)
    act = 0.1 * jnp.ones((env.num_envs, 12))
    for _ in range(3):
        obs_a, rew_a, done_a, _ = adapter.step(act)
        state_f, obs_f, rew_f, done_f, _ = step(state_f, act)
    np.testing.assert_array_equal(np.asarray(obs_a["obs_history"]),
                                  np.asarray(obs_f["obs_history"]))
    np.testing.assert_array_equal(np.asarray(rew_a), np.asarray(rew_f))
    np.testing.assert_array_equal(np.asarray(done_a), np.asarray(done_f))


def test_envelope_exit_terminates(env_and_state):
    """An env whose base velocity saturates the integrator caps must be
    terminated by the envelope guard (runs/seed2_blowup fix 3)."""
    env, state, obs = env_and_state
    sp = env.sim_params
    # horizontal velocity at the cap: unchanged by gravity across the
    # step, so the post-step guard sees it exactly at the cap
    bad_vel = jnp.zeros_like(state.phys.base_lin_vel
                             ).at[0, 0].set(sp.max_base_lin_vel)
    state = state._replace(phys=state.phys._replace(
        base_pos=state.phys.base_pos + jnp.array([0.0, 0.0, 5.0]),
        base_lin_vel=bad_vel))
    actions = jnp.zeros((env.num_envs, 12))
    _, _, _, done, info = jax.jit(env.step)(state, actions)
    done = np.asarray(done)
    assert done[0], "cap-saturating env must terminate"
    assert not done[1:].any(), "healthy envs must not"


def test_eval_split_commands_and_terrain_divergence():
    """eval_cfg may diverge in commands and terrain (reference
    base_task.py:43-50 per-split cfg dispatch; utils/terrain.py:12-30
    appends eval terrain rows): eval envs get their own command
    curriculum over the eval limits and spawn on the appended eval rows."""
    import dataclasses as dc
    from walk_these_ways_tpu.go1_config import mob_train_cfg

    cfg = mob_train_cfg(num_envs=3)
    ev = mob_train_cfg(num_envs=3)
    # eval commands: forward-only x velocity with different bin count
    ev = dc.replace(ev, commands=dc.replace(
        ev.commands, limit_vel_x=(0.5, 2.0), num_bins_vel_x=5,
        resampling_time=ev.commands.resampling_time))
    # eval terrain: its own (still all-flat boxes) rows appended
    ev = dc.replace(ev, terrain=dc.replace(
        ev.terrain, num_rows=2, num_cols=2, mesh_type="heightfield",
        terrain_proportions=(0.0, 1.0)))
    env = LeggedRobotEnv(xla_physics(cfg), eval_cfg=xla_physics(ev))
    assert env.eval_commands_differ and env.eval_terrain_differs
    T = env.num_train_envs
    # eval spawn rows sit beyond the train block along x
    tr_max_x = float(np.asarray(env.env_origins[:T, 0]).max())
    ev_min_x = float(np.asarray(env.env_origins[T:, 0]).min())
    assert ev_min_x > tr_max_x

    state, obs = env.reset(jax.random.PRNGKey(3))
    # force a resample on every env and check per-split command limits
    state = env._resample_commands(
        state, jnp.ones(env.num_envs, bool), jax.random.PRNGKey(7))
    vx = np.asarray(state.commands[:, 0])
    assert (vx[T:] >= 0.5 - 1e-5).all() and (vx[T:] <= 2.0 + 1e-5).all(), vx
    # train split keeps the symmetric limits (some negative mass exists
    # in the grid; just check the bounds)
    assert (vx[:T] >= -10.0 - 1e-5).all() and (vx[:T] <= 10.0 + 1e-5).all()
    # eval curriculum state exists and has the eval grid's bin count
    assert state.curriculum_eval is not None
    assert (state.curriculum_eval.weights.shape
            != state.curriculum.weights.shape)
