"""CoRL (walk-these-ways / MoB) reward terms, pure-functional.

Each term reproduces the corresponding ``_reward_<name>`` method of the
reference reward container (reference: go1_gym/envs/rewards/corl_rewards.py,
file:line cited per term).  Terms take a `RewardCtx` of batched tensors and
return an unscaled (N,) reward; scaling by `scale * dt` and the
positive/negative split happen in the env (legged_robot.py:263-300).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import Cfg
from ..ops import quat as qops


class RewardCtx(NamedTuple):
    cfg: Cfg
    dt: float
    commands: jnp.ndarray              # (N, 15)
    base_pos: jnp.ndarray              # (N, 3)
    base_quat: jnp.ndarray             # (N, 4)
    base_lin_vel: jnp.ndarray          # (N, 3) body frame
    base_ang_vel: jnp.ndarray          # (N, 3) body frame
    projected_gravity: jnp.ndarray     # (N, 3)
    gravity_vec: jnp.ndarray           # (N, 3) unit gravity direction
    dof_pos: jnp.ndarray               # (N, 12)
    default_dof_pos: jnp.ndarray       # (12,)
    dof_vel: jnp.ndarray               # (N, 12)
    last_dof_vel: jnp.ndarray
    torques: jnp.ndarray               # (N, 12)
    actions: jnp.ndarray               # (N, 12)
    last_actions: jnp.ndarray
    last_last_actions: jnp.ndarray
    joint_pos_target: jnp.ndarray
    last_joint_pos_target: jnp.ndarray
    last_last_joint_pos_target: jnp.ndarray
    contact_forces: jnp.ndarray        # (N, 17, 3) report bodies
    foot_velocities: jnp.ndarray       # (N, 4, 3)
    prev_foot_velocities: jnp.ndarray  # (N, 4, 3)
    foot_positions: jnp.ndarray        # (N, 4, 3)
    desired_contact_states: jnp.ndarray  # (N, 4)
    foot_indices: jnp.ndarray          # (N, 4) raw gait phases in [0,1)
    last_contacts: jnp.ndarray         # (N, 4) bool
    dof_pos_limits: jnp.ndarray        # (12, 2) soft limits
    feet_indices: tuple                # report indices of feet
    penalised_indices: tuple           # report indices of thigh+calf


def tracking_lin_vel(c: RewardCtx):
    # corl_rewards.py:15-18
    err = jnp.sum(jnp.square(c.commands[:, :2] - c.base_lin_vel[:, :2]), axis=1)
    return jnp.exp(-err / c.cfg.rewards.tracking_sigma)


def tracking_ang_vel(c: RewardCtx):
    # corl_rewards.py:20-23
    err = jnp.square(c.commands[:, 2] - c.base_ang_vel[:, 2])
    return jnp.exp(-err / c.cfg.rewards.tracking_sigma_yaw)


def lin_vel_z(c: RewardCtx):
    # corl_rewards.py:25-27
    return jnp.square(c.base_lin_vel[:, 2])


def ang_vel_xy(c: RewardCtx):
    # corl_rewards.py:29-31
    return jnp.sum(jnp.square(c.base_ang_vel[:, :2]), axis=1)


def orientation(c: RewardCtx):
    # corl_rewards.py:33-35
    return jnp.sum(jnp.square(c.projected_gravity[:, :2]), axis=1)


def torques(c: RewardCtx):
    # corl_rewards.py:37-39
    return jnp.sum(jnp.square(c.torques), axis=1)


def dof_acc(c: RewardCtx):
    # corl_rewards.py:41-43
    return jnp.sum(jnp.square((c.last_dof_vel - c.dof_vel) / c.dt), axis=1)


def action_rate(c: RewardCtx):
    # corl_rewards.py:45-47
    return jnp.sum(jnp.square(c.last_actions - c.actions), axis=1)


def collision(c: RewardCtx):
    # corl_rewards.py:49-52 (thigh/calf contacts)
    f = c.contact_forces[:, c.penalised_indices, :]
    return jnp.sum(1.0 * (jnp.linalg.norm(f, axis=-1) > 0.1), axis=1)


def dof_pos_limits(c: RewardCtx):
    # corl_rewards.py:54-58
    out = -jnp.clip(c.dof_pos - c.dof_pos_limits[:, 0], None, 0.0)
    out += jnp.clip(c.dof_pos - c.dof_pos_limits[:, 1], 0.0, None)
    return jnp.sum(out, axis=1)


def jump(c: RewardCtx):
    # corl_rewards.py:60-65
    body_height = c.base_pos[:, 2]
    target = c.commands[:, 3] + c.cfg.rewards.base_height_target
    return -jnp.square(body_height - target)


def tracking_contacts_shaped_force(c: RewardCtx):
    # corl_rewards.py:67-75
    foot_forces = jnp.linalg.norm(c.contact_forces[:, c.feet_indices, :], axis=-1)
    desired = c.desired_contact_states
    r = -(1 - desired) * (
        1 - jnp.exp(-foot_forces ** 2 / c.cfg.rewards.gait_force_sigma))
    return jnp.sum(r, axis=1) / 4


def tracking_contacts_shaped_vel(c: RewardCtx):
    # corl_rewards.py:77-84
    foot_speed = jnp.linalg.norm(c.foot_velocities, axis=2)
    desired = c.desired_contact_states
    r = -desired * (1 - jnp.exp(-foot_speed ** 2 / c.cfg.rewards.gait_vel_sigma))
    return jnp.sum(r, axis=1) / 4


def dof_pos(c: RewardCtx):
    # corl_rewards.py:86-88
    return jnp.sum(jnp.square(c.dof_pos - c.default_dof_pos[None, :]), axis=1)


def dof_vel(c: RewardCtx):
    # corl_rewards.py:90-92
    return jnp.sum(jnp.square(c.dof_vel), axis=1)


def action_smoothness_1(c: RewardCtx):
    # corl_rewards.py:94-98
    diff = jnp.square(c.joint_pos_target - c.last_joint_pos_target)
    diff = diff * (c.last_actions != 0)
    return jnp.sum(diff, axis=1)


def action_smoothness_2(c: RewardCtx):
    # corl_rewards.py:100-105
    diff = jnp.square(c.joint_pos_target - 2 * c.last_joint_pos_target
                      + c.last_last_joint_pos_target)
    diff = diff * (c.last_actions != 0) * (c.last_last_actions != 0)
    return jnp.sum(diff, axis=1)


def feet_slip(c: RewardCtx):
    # corl_rewards.py:107-113 (uses the step's contact OR'd with last step's)
    contact = c.contact_forces[:, c.feet_indices, 2] > 1.0
    contact_filt = jnp.logical_or(contact, c.last_contacts)
    foot_speed_sq = jnp.square(
        jnp.linalg.norm(c.foot_velocities[:, :, 0:2], axis=2))
    return jnp.sum(contact_filt * foot_speed_sq, axis=1)


def feet_contact_vel(c: RewardCtx):
    # corl_rewards.py:115-120
    near_ground = c.foot_positions[:, :, 2] < 0.03
    foot_speed_sq = jnp.square(jnp.linalg.norm(c.foot_velocities, axis=2))
    return jnp.sum(near_ground * foot_speed_sq, axis=1)


def feet_contact_forces(c: RewardCtx):
    # corl_rewards.py:122-125
    f = jnp.linalg.norm(c.contact_forces[:, c.feet_indices, :], axis=-1)
    return jnp.sum(jnp.clip(f - c.cfg.rewards.max_contact_force, 0.0, None), axis=1)


def feet_clearance_cmd_linear(c: RewardCtx):
    # corl_rewards.py:127-132
    phases = 1 - jnp.abs(1.0 - jnp.clip(c.foot_indices * 2.0 - 1.0, 0.0, 1.0) * 2.0)
    foot_height = c.foot_positions[:, :, 2]
    target = c.commands[:, 9:10] * phases + 0.02   # +2cm foot radius
    rew = jnp.square(target - foot_height) * (1 - c.desired_contact_states)
    return jnp.sum(rew, axis=1)


def feet_impact_vel(c: RewardCtx):
    # corl_rewards.py:134-140
    prev_vz = c.prev_foot_velocities[:, :, 2]
    contact = jnp.linalg.norm(c.contact_forces[:, c.feet_indices, :], axis=-1) > 1.0
    return jnp.sum(contact * jnp.square(jnp.clip(prev_vz, -100.0, 0.0)), axis=1)


def orientation_control(c: RewardCtx):
    # corl_rewards.py:148-159
    roll_cmd, pitch_cmd = c.commands[:, 11], c.commands[:, 10]
    quat_roll = qops.quat_from_angle_axis(-roll_cmd, jnp.array([1.0, 0.0, 0.0]))
    quat_pitch = qops.quat_from_angle_axis(-pitch_cmd, jnp.array([0.0, 1.0, 0.0]))
    desired_q = qops.quat_mul(quat_roll, quat_pitch)
    desired_pg = qops.quat_rotate_inverse(desired_q, c.gravity_vec)
    return jnp.sum(
        jnp.square(c.projected_gravity[:, :2] - desired_pg[:, :2]), axis=1)


def raibert_heuristic(c: RewardCtx):
    # corl_rewards.py:161-202
    cur = c.foot_positions - c.base_pos[:, None, :]
    inv_yaw = qops.quat_conjugate(c.base_quat)
    steps_body = qops.quat_apply_yaw(inv_yaw[:, None, :], cur)   # (N, 4, 3)
    w = c.commands[:, 12:13]
    ys_nom = jnp.concatenate([w / 2, -w / 2, w / 2, -w / 2], axis=1)
    ln = c.commands[:, 13:14]
    xs_nom = jnp.concatenate([ln / 2, ln / 2, -ln / 2, -ln / 2], axis=1)
    phases = jnp.abs(1.0 - c.foot_indices * 2.0) * 1.0 - 0.5
    freq = c.commands[:, 4]
    x_vel_des = c.commands[:, 0:1]
    yaw_vel_des = c.commands[:, 2:3]
    y_vel_des = yaw_vel_des * ln / 2
    ys_off = phases * y_vel_des * (0.5 / freq[:, None])
    ys_off = ys_off.at[:, 2:4].multiply(-1.0)
    xs_off = phases * x_vel_des * (0.5 / freq[:, None])
    desired = jnp.stack([xs_nom + xs_off, ys_nom + ys_off], axis=2)
    err = jnp.abs(desired - steps_body[:, :, 0:2])
    return jnp.sum(jnp.square(err), axis=(1, 2))


TERMS = {
    "tracking_lin_vel": tracking_lin_vel,
    "tracking_ang_vel": tracking_ang_vel,
    "lin_vel_z": lin_vel_z,
    "ang_vel_xy": ang_vel_xy,
    "orientation": orientation,
    "torques": torques,
    "dof_acc": dof_acc,
    "action_rate": action_rate,
    "collision": collision,
    "dof_pos_limits": dof_pos_limits,
    "jump": jump,
    "tracking_contacts_shaped_force": tracking_contacts_shaped_force,
    "tracking_contacts_shaped_vel": tracking_contacts_shaped_vel,
    "dof_pos": dof_pos,
    "dof_vel": dof_vel,
    "action_smoothness_1": action_smoothness_1,
    "action_smoothness_2": action_smoothness_2,
    "feet_slip": feet_slip,
    "feet_contact_vel": feet_contact_vel,
    "feet_contact_forces": feet_contact_forces,
    "feet_clearance_cmd_linear": feet_clearance_cmd_linear,
    "feet_impact_vel": feet_impact_vel,
    "orientation_control": orientation_control,
    "raibert_heuristic": raibert_heuristic,
}


def active_terms(cfg: Cfg):
    """Nonzero-scale terms, in declaration order (mirrors
    _prepare_reward_function, legged_robot.py:1385-1412).  The reference
    warns on a nonzero scale with no _reward_<name> implementation; here
    that is a hard error so a typo'd or unimplemented term cannot silently
    train as a no-op."""
    names = []
    for name, scale in cfg.reward_scales.items():
        if scale == 0.0 or name == "termination":
            continue
        if name not in TERMS:
            raise NotImplementedError(
                f"reward '{name}' has nonzero scale {scale} but no "
                f"implementation in rewards.TERMS (available: "
                f"{sorted(TERMS)})")
        names.append(name)
    return tuple(names)
