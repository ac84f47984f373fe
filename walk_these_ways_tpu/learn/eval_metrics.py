"""Policy-quality evaluation metrics + domain-randomization sweep presets.

TPU-native rebuild of the reference eval library (reference:
go1_gym_learn/eval_metrics/metrics.py:1-99 `METRICS_FNS` and
go1_gym_learn/eval_metrics/domain_randomization.py:141-148 `DR_SETTINGS`).
Metric fns are pure: (env, env_state, params, obs_dict) -> (N,) array.
DR presets return a DomainRandCfg to `dataclasses.replace` into a config.
"""
from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ..config import DomainRandCfg
from ..models import actor_critic as ac
from ..ops import quat as qops


def _base_vels(env_state):
    q = env_state.phys.base_quat
    return (qops.quat_rotate_inverse(q, env_state.phys.base_lin_vel),
            qops.quat_rotate_inverse(q, env_state.phys.base_ang_vel))


def lin_vel_rmsd(env, s, params, obs):
    v, _ = _base_vels(s)
    return jnp.abs(v[:, 0] - s.commands[:, 0])


def ang_vel_rmsd(env, s, params, obs):
    _, w = _base_vels(s)
    return jnp.abs(w[:, 2] - s.commands[:, 2])


def lin_vel_x(env, s, params, obs):
    v, _ = _base_vels(s)
    return v[:, 0]


def ang_vel_yaw(env, s, params, obs):
    _, w = _base_vels(s)
    return w[:, 2]


def base_height(env, s, params, obs):
    return s.phys.base_pos[:, 2]


def max_torques(env, s, params, obs):
    return jnp.max(jnp.abs(s.torques), axis=1)


def power_consumption(env, s, params, obs):
    return jnp.sum(s.torques * s.phys.qd, axis=1)


def cost_of_transport(env, s, params, obs):
    """P / (m g v) (reference metrics.py:40-47)."""
    P = power_consumption(env, s, params, obs)
    m = env.model.mass.sum() + s.payloads
    v, _ = _base_vels(s)
    speed = jnp.linalg.norm(v[:, :2], axis=1)
    return P / (m * 9.8 * jnp.maximum(speed, 1e-6))


def froude_number(env, s, params, obs):
    v = lin_vel_x(env, s, params, obs)
    return v ** 2 / (9.8 * 0.30)


def adaptation_loss(env, s, params, obs):
    pred = ac.adaptation_forward(params, obs["obs_history"])
    return jnp.mean(jnp.square(pred - obs["privileged_obs"]), axis=1)


def termination(env, s, params, obs):
    return (s.episode_length == 0).astype(jnp.float32)


def auxiliary_rewards(env, s, params, obs):
    """Per-term scaled reward dict (reference metrics.py:66-73 loops
    env.reward_functions; here every active term is a pure fn of the
    env's RewardCtx)."""
    from ..envs import rewards as rew_mod
    ctx = env.make_reward_ctx(s)
    return {name: rew_mod.TERMS[name](ctx) * scale
            for name, scale in zip(env.reward_names, env.reward_scales)}


def privileged_obs(env, s, params, obs):
    """reference metrics.py:79-80"""
    return obs["privileged_obs"]


def latents(env, s, params, obs):
    """The policy's estimated privileged latent (reference metrics.py:83-84
    uses the RMA env_factor_encoder; the cse variant's analog is the
    adaptation module's prediction from the obs history)."""
    return ac.adaptation_forward(params, obs["obs_history"])


METRICS_FNS = dict(
    lin_vel_rmsd=lin_vel_rmsd,
    ang_vel_rmsd=ang_vel_rmsd,
    lin_vel_x=lin_vel_x,
    ang_vel_yaw=ang_vel_yaw,
    base_height=base_height,
    max_torques=max_torques,
    power_consumption=power_consumption,
    cost_of_transport=cost_of_transport,
    froude_number=froude_number,
    adaptation_loss=adaptation_loss,
    termination=termination,
    auxiliary_rewards=auxiliary_rewards,
    privileged_obs=privileged_obs,
    latents=latents,
)


# -- DR sweep presets (domain_randomization.py) -----------------------------

def _dr(**kw) -> DomainRandCfg:
    base = DomainRandCfg(
        randomize_friction=True, randomize_restitution=True,
        randomize_base_mass=True, randomize_com_displacement=True,
        randomize_motor_strength=True,
        randomize_Kp_factor=False, randomize_Kd_factor=False,
        push_robots=False,
    )
    return replace(base, **kw)


DR_SETTINGS = dict(
    rand_regular=_dr(
        friction_range=(0.05, 4.5), restitution_range=(0.0, 1.0),
        added_mass_range=(-1.0, 3.0), com_displacement_range=(-0.1, 0.1),
        motor_strength_range=(0.9, 1.1)),
    rand_large=_dr(
        friction_range=(0.04, 6.0), restitution_range=(0.0, 1.0),
        added_mass_range=(-1.5, 4.0), com_displacement_range=(-0.13, 0.13),
        motor_strength_range=(0.88, 1.12)),
    static_low=_dr(
        friction_range=(0.05, 0.06), restitution_range=(0.0, 0.01),
        added_mass_range=(-1.0, -0.99), com_displacement_range=(-0.1, -0.09),
        motor_strength_range=(0.9, 0.91)),
    static_medium=_dr(
        friction_range=(1.0, 1.01), restitution_range=(0.5, 0.51),
        added_mass_range=(0.0, 0.01), com_displacement_range=(0.0, 0.01),
        motor_strength_range=(1.0, 1.01)),
    static_high=_dr(
        friction_range=(4.49, 4.5), restitution_range=(0.99, 1.0),
        added_mass_range=(2.99, 3.0), com_displacement_range=(0.09, 0.1),
        motor_strength_range=(1.09, 1.1)),
    only_base_mass=_dr(
        randomize_friction=False, randomize_restitution=False,
        randomize_com_displacement=False, randomize_motor_strength=False,
        randomize_base_mass=True, added_mass_range=(-1.0, 3.0)),
)


def evaluate_policy(env, params, rng, num_steps: int = 250,
                    metric_names=("lin_vel_rmsd", "ang_vel_rmsd",
                                  "power_consumption", "cost_of_transport")):
    """Run a student-policy rollout and return per-metric means over the run
    (the analog of the reference's eval loop)."""
    import jax

    state, obs = env.reset(rng)
    step = jax.jit(env.step)
    pol = jax.jit(lambda p, h: ac.actor_mean(p, h))
    sums = {k: 0.0 for k in metric_names}
    for _ in range(num_steps):
        actions = pol(params, obs["obs_history"])
        state, obs, rew, done, info = step(state, actions)
        for k in metric_names:
            sums[k] += float(jnp.mean(METRICS_FNS[k](env, state, params, obs)))
    return {k: v / num_steps for k, v in sums.items()}
