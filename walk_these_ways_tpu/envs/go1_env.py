"""Walk-these-ways velocity-tracking environment, TPU-native.

This is the functional rebuild of the reference env stack — BaseTask +
LeggedRobot + VelocityTrackingEasyEnv + HistoryWrapper (reference:
go1_gym/envs/base/base_task.py, go1_gym/envs/base/legged_robot.py,
go1_gym/envs/go1/velocity_tracking/__init__.py,
go1_gym/envs/wrappers/history_wrapper.py) — as a single pure step function
over an `EnvState` pytree:

    step: (EnvState, actions) -> (EnvState, obs_dict, rew, done, info)

Everything the reference does with ~60 mutable buffers, CPU curriculum
round-trips, and per-env-id indexed resets becomes masked dense updates with
per-env RNG — fully jittable, shardable along the env axis, no host syncs.

Step ordering mirrors LeggedRobot.step/post_physics_step exactly
(legged_robot.py:60-136): clip actions -> decimation x {torque model,
physics} -> kinematic quantities -> teleport/resample/gait-clock/push/DR
callbacks -> termination -> rewards -> masked auto-reset -> observations ->
shift last_* buffers.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.stats as jstats

from ..config import Cfg
from ..models import actuator_net
from ..models.robot import RobotModel, default_dof_pos, go1, pd_gains
from ..ops import quat as qops
from ..physics import engine
from . import curriculum as curr
from . import rewards as rew_mod
from . import terrain as terrain_mod

COMMAND_SUM_KEYS = curr.TASK_KEYS + (
    "lin_vel_raw", "ang_vel_raw", "lin_vel_residual", "ang_vel_residual",
    "ep_timesteps",
)


class EnvState(NamedTuple):
    phys: engine.PhysicsState
    rng: jax.Array
    # control pipeline
    actions: jnp.ndarray                 # (N, 12) clipped policy actions
    last_actions: jnp.ndarray
    last_last_actions: jnp.ndarray
    joint_pos_target: jnp.ndarray
    last_joint_pos_target: jnp.ndarray
    last_last_joint_pos_target: jnp.ndarray
    last_dof_vel: jnp.ndarray
    lag_buffer: jnp.ndarray              # (N, lag+1, 12)
    torques: jnp.ndarray                 # (N, 12) last applied
    # actuator-net history (updated per physics substep)
    joint_pos_err_last: jnp.ndarray
    joint_pos_err_last_last: jnp.ndarray
    joint_vel_last: jnp.ndarray
    joint_vel_last_last: jnp.ndarray
    # episode bookkeeping
    episode_length: jnp.ndarray          # (N,) int32
    common_step: jnp.ndarray             # () int32
    # commands & gait machinery
    commands: jnp.ndarray                # (N, 15)
    gait_indices: jnp.ndarray            # (N,)
    clock_inputs: jnp.ndarray            # (N, 4)
    desired_contact_states: jnp.ndarray  # (N, 4)
    foot_indices: jnp.ndarray            # (N, 4)
    # kinematic caches from last substep
    contact_forces: jnp.ndarray          # (N, 17, 3)
    foot_positions: jnp.ndarray          # (N, 4, 3)
    foot_velocities: jnp.ndarray         # (N, 4, 3)
    prev_foot_velocities: jnp.ndarray
    last_contacts: jnp.ndarray           # (N, 4) bool
    # domain randomization
    payloads: jnp.ndarray                # (N,)
    com_displacements: jnp.ndarray       # (N, 3)
    friction_coeffs: jnp.ndarray         # (N,)
    restitutions: jnp.ndarray            # (N,)
    motor_strengths: jnp.ndarray         # (N, 12)
    motor_offsets: jnp.ndarray           # (N, 12)
    Kp_factors: jnp.ndarray              # (N, 12)
    Kd_factors: jnp.ndarray              # (N, 12)
    gravity_offset: jnp.ndarray          # (3,)  shared across envs
    # logging accumulators
    episode_sums: jnp.ndarray            # (N, n_terms + 1) [+1 = total]
    command_sums: jnp.ndarray            # (N, len(COMMAND_SUM_KEYS))
    # curriculum
    curriculum: curr.CurriculumState
    env_command_bins: jnp.ndarray        # (N,) int32
    env_command_categories: jnp.ndarray  # (N,) int32
    # observation history (HistoryWrapper state)
    obs_history: jnp.ndarray             # (N, H * num_obs)
    # contact impulses carried across control steps for the cross-step
    # warm start (env-minor (P, 3, Npad) like the mega-kernel carries
    # them; zeroed for reset envs).  Always allocated so the pytree
    # structure is config-independent; stays zero unless
    # sim.contact_cross_step_warm_start is on.
    contact_lam_t: jnp.ndarray           # (P, 3, Npad)
    # eval slice's own command curriculum over eval_cfg.commands' grid
    # (None — a leafless subtree — unless the eval commands cfg diverges,
    # so default-case checkpoints keep their key paths)
    curriculum_eval: "curr.CurriculumState | None" = None


class StepInfo(NamedTuple):
    time_outs: jnp.ndarray               # (N,)
    env_bins: jnp.ndarray                # (N,)
    # per-term sums over envs that finished an episode this step + count,
    # for host-side logging without any device->host sync in the hot loop;
    # split into train/eval slices (reference logs separate
    # train/episode and eval/episode groups, ppo_cse/__init__.py:156-180)
    ep_sums_done: jnp.ndarray            # (n_terms + 1,)  train slice
    ep_count_done: jnp.ndarray           # ()
    ep_len_done: jnp.ndarray             # () summed episode lengths at done
    eval_ep_sums_done: jnp.ndarray       # (n_terms + 1,)  eval slice
    eval_ep_count_done: jnp.ndarray      # ()
    eval_ep_len_done: jnp.ndarray        # ()
    torques: jnp.ndarray                 # (N, 12)
    # envs terminated THIS step by the integrator-envelope crash guard
    # (runs/seed2_blowup fix 3) — surfaced so "zero envelope exits over a
    # run" is a checkable claim in metrics.jsonl, not an assertion
    envelope_exits: jnp.ndarray          # ()


class LeggedRobotEnv:
    """Static env context; all methods are pure and jit-friendly.

    Train/eval env split (reference base_task.py:43-50): when `eval_cfg`
    is given, `eval_cfg.env.num_envs` extra envs are appended after the
    `cfg.env.num_envs` train envs.  Eval envs may use a different
    `domain_rand` section (the eval_metrics DR presets); all other
    sections must match — per-env DR ranges are baked as dense arrays, so
    the split costs nothing inside the jitted step.  The trainer runs the
    deterministic student (or teacher) on the eval slice and excludes it
    from PPO (reference ppo_cse/__init__.py:140-147)."""

    def __init__(self, cfg: Cfg, model: RobotModel | None = None,
                 terrain_seed: int = 0, eval_cfg: Cfg | None = None):
        self.cfg = cfg
        self.eval_cfg = eval_cfg
        self.model = model or go1()
        m = self.model
        self.num_train_envs = cfg.env.num_envs
        self.num_eval_envs = eval_cfg.env.num_envs if eval_cfg else 0
        if eval_cfg is not None:
            # supported divergence: domain_rand, commands, terrain (and
            # env.num_envs) — mirroring the reference's per-split cfg
            # dispatch (_call_train_eval, legged_robot.py:531-544, and the
            # eval terrain rows in utils/terrain.py:12-30); the rest of
            # the config tree is baked into one program
            import dataclasses as _dc
            a = _dc.replace(cfg, env=_dc.replace(cfg.env, num_envs=0),
                            domain_rand=cfg.domain_rand,
                            commands=cfg.commands, terrain=cfg.terrain)
            b = _dc.replace(eval_cfg, env=_dc.replace(eval_cfg.env, num_envs=0),
                            domain_rand=cfg.domain_rand,
                            commands=cfg.commands, terrain=cfg.terrain)
            assert a == b, ("eval_cfg may differ from cfg only in "
                            "domain_rand, commands, terrain and "
                            "env.num_envs")
            cfg = _dc.replace(
                cfg, env=_dc.replace(
                    cfg.env,
                    num_envs=self.num_train_envs + self.num_eval_envs))
            self.cfg = cfg
        self.eval_commands_differ = (
            eval_cfg is not None and eval_cfg.commands != cfg.commands)
        self.eval_terrain_differs = (
            eval_cfg is not None and eval_cfg.terrain != cfg.terrain)
        self.num_envs = cfg.env.num_envs
        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.num_actions = cfg.env.num_actions
        self.num_obs_history = cfg.env.num_observation_history * self.num_obs
        self.dt = cfg.dt
        self.max_episode_length = cfg.max_episode_length

        self.reuse_matrices = cfg.sim.reuse_matrices

        # terrain ---------------------------------------------------------
        np_rng = np.random.RandomState(terrain_seed)
        hf_types = ("heightfield", "trimesh")
        if self.eval_terrain_differs and (
                cfg.terrain.mesh_type in hf_types
                or eval_cfg.terrain.mesh_type in hf_types):
            # per-split terrains: eval rows appended after the train rows
            # in one heightfield (reference utils/terrain.py:12-30 takes
            # both cfgs; eval env origins land on the eval rows).  A
            # plane-type split still goes through build() — its tiles
            # resolve flat.
            tr_arr = terrain_mod.build(cfg.terrain, seed=terrain_seed)
            ev_arr = terrain_mod.build(eval_cfg.terrain,
                                       seed=terrain_seed + 1)
            combined, ev_shifted = terrain_mod.combine_with_eval(
                tr_arr, ev_arr)
            if np.abs(combined.height).max() == 0.0:
                self.terrain = engine.flat_terrain()
            else:
                self.terrain = engine.make_heightfield_terrain(
                    combined.height, combined.horizontal_scale,
                    combined.origin_xy)
            origins = np.concatenate([
                terrain_mod.assign_env_origins(
                    cfg.terrain, combined, self.num_train_envs, np_rng),
                terrain_mod.assign_env_origins(
                    eval_cfg.terrain, ev_shifted, self.num_eval_envs,
                    np_rng)], axis=0)
        elif cfg.terrain.mesh_type in hf_types:
            arrays = terrain_mod.build(cfg.terrain, seed=terrain_seed)
            if np.abs(arrays.height).max() == 0.0:
                # all-flat tiles (e.g. the MoB train config): use the
                # gather-free flat-ground fast path
                self.terrain = engine.flat_terrain()
            else:
                self.terrain = engine.make_heightfield_terrain(
                    arrays.height, arrays.horizontal_scale,
                    arrays.origin_xy)
            origins = terrain_mod.assign_env_origins(
                cfg.terrain, arrays, self.num_envs, np_rng)
        else:
            self.terrain = engine.flat_terrain()
            origins = terrain_mod.grid_env_origins(self.num_envs)
        self.env_origins = jnp.asarray(origins)

        # the Pallas contact pipeline serves flat ground (the MoB train
        # config resolves to the flat fast path) AND heightfields (surface
        # normals n_t flow into the kernels); only exact mode is flat-only
        self.sim_params = engine.SimParams(
            dt=cfg.sim.dt, num_contact_iters=cfg.sim.num_contact_iters,
            use_pallas_contact=cfg.sim.use_pallas_contact,
            contact_warm_start=cfg.sim.contact_warm_start,
            num_contact_iters_warm=cfg.sim.num_contact_iters_warm,
            contact_cross_step_warm_start=(
                cfg.sim.contact_cross_step_warm_start))

        # constants -------------------------------------------------------
        self.default_dof_pos = default_dof_pos(
            m, dict(cfg.init_state.default_joint_angles))
        self.p_gains, self.d_gains = pd_gains(
            m, dict(cfg.control.stiffness), dict(cfg.control.damping))
        self.torque_limits = jnp.asarray(m.dof_effort, dtype=jnp.float32)
        # soft dof position limits (legged_robot.py:603-607)
        lo = np.asarray(m.dof_lower)
        hi = np.asarray(m.dof_upper)
        mid, r = (lo + hi) / 2, hi - lo
        soft = cfg.rewards.soft_dof_pos_limit
        self.dof_pos_limits = jnp.asarray(
            np.stack([mid - 0.5 * r * soft, mid + 0.5 * r * soft], axis=-1),
            dtype=jnp.float32)
        self.feet_indices = tuple(int(i) for i in m.feet_report_indices)
        pen = []
        for i, name in enumerate(m.report_body_names):
            if "thigh" in name or "calf" in name:
                pen.append(i)
        self.penalised_indices = tuple(pen)
        self.termination_indices = (0,)  # base

        # commands scale (legged_robot.py:1196-1203)
        osc = cfg.obs_scales
        self.commands_scale = jnp.asarray(
            [osc.lin_vel, osc.lin_vel, osc.ang_vel, osc.body_height_cmd,
             osc.gait_freq_cmd, osc.gait_phase_cmd, osc.gait_phase_cmd,
             osc.gait_phase_cmd, osc.gait_phase_cmd, osc.footswing_height_cmd,
             osc.body_pitch_cmd, osc.body_roll_cmd, osc.stance_width_cmd,
             osc.stance_length_cmd, osc.aux_reward_cmd][:cfg.commands.num_commands],
            dtype=jnp.float32)

        self.noise_scale_vec = self._make_noise_vec()

        # curriculum ------------------------------------------------------
        self.curr_grid = curr.make_grid(cfg.commands)
        # per-split command curriculum: the eval slice samples from its
        # own grid over eval_cfg.commands (reference _call_train_eval
        # dispatches _resample_commands with each split's cfg,
        # legged_robot.py:531-544, 710-824)
        self.curr_grid_eval = (curr.make_grid(eval_cfg.commands)
                               if self.eval_commands_differ else None)
        # dt-scaled reward scales (legged_robot.py:1394-1400)
        self.reward_names = rew_mod.active_terms(cfg)
        scales = dict(cfg.reward_scales.items())
        self.reward_scales = tuple(scales[n] * self.dt for n in self.reward_names)
        thr = cfg.curriculum_thresholds
        thr_map = dict(
            tracking_lin_vel=thr.tracking_lin_vel,
            tracking_ang_vel=thr.tracking_ang_vel,
            tracking_contacts_shaped_force=thr.tracking_contacts_shaped_force,
            tracking_contacts_shaped_vel=thr.tracking_contacts_shaped_vel,
        )
        self.task_thresholds = jnp.asarray(
            [thr_map[k] * scales.get(k, 0.0) * self.dt for k in curr.TASK_KEYS],
            dtype=jnp.float32)

        # actuator network ------------------------------------------------
        if cfg.control.control_type == "actuator_net":
            self.actuator_params = actuator_net.load()
            # block-diagonal weights for the in-kernel MXU evaluation
            # (ops/pallas_megastep.py)
            from ..ops import pallas_megastep as _pm
            self.actuator_blockdiag = _pm.blockdiag_actuator_weights(
                self.actuator_params)
        else:
            self.actuator_params = None
            self.actuator_blockdiag = None

        # height measurement points (legged_robot.py:1756-1770)
        if cfg.terrain.measure_heights:
            gx, gy = np.meshgrid(np.asarray(cfg.terrain.measured_points_x),
                                 np.asarray(cfg.terrain.measured_points_y),
                                 indexing="ij")
            self.height_points = jnp.asarray(
                np.stack([gx.reshape(-1), gy.reshape(-1),
                          np.zeros(gx.size)], axis=-1), dtype=jnp.float32)
            self.num_height_points = gx.size
        else:
            self.height_points = None
            self.num_height_points = 0

        # derived intervals (legged_robot.py:1716-1732)
        self.resample_interval = int(cfg.commands.resampling_time / self.dt)
        if self.eval_commands_differ:
            ev_interval = int(eval_cfg.commands.resampling_time / self.dt)
            self.resample_interval_arr = jnp.asarray(np.concatenate([
                np.full(self.num_train_envs, self.resample_interval),
                np.full(self.num_eval_envs, ev_interval)]), jnp.int32)
        else:
            self.resample_interval_arr = None
        self.rand_interval = int(np.ceil(cfg.domain_rand.rand_interval_s / self.dt))
        self.push_interval = int(np.ceil(cfg.domain_rand.push_interval_s / self.dt))
        self.gravity_rand_interval = int(
            np.ceil(cfg.domain_rand.gravity_rand_interval_s / self.dt))
        self.gravity_rand_duration = int(np.ceil(
            self.gravity_rand_interval * cfg.domain_rand.gravity_impulse_duration))

    # -- noise ------------------------------------------------------------
    def _make_noise_vec(self) -> jnp.ndarray:
        """Observation noise scales (legged_robot.py:1053-1120)."""
        cfg = self.cfg
        ns, osc = cfg.noise_scales, cfg.obs_scales
        lvl = cfg.noise.noise_level
        parts = [np.ones(3) * ns.gravity * lvl]
        if cfg.env.observe_command:
            parts.append(np.zeros(cfg.commands.num_commands))
        parts.append(np.ones(12) * ns.dof_pos * lvl * osc.dof_pos)
        parts.append(np.ones(12) * ns.dof_vel * lvl * osc.dof_vel)
        parts.append(np.zeros(12))  # actions
        if cfg.env.observe_two_prev_actions:
            parts.append(np.zeros(12))
        if cfg.env.observe_timing_parameter:
            parts.append(np.zeros(1))
        if cfg.env.observe_clock_inputs:
            parts.append(np.zeros(4))
        if cfg.env.observe_vel:
            parts = [np.ones(3) * ns.lin_vel * lvl * osc.lin_vel,
                     np.ones(3) * ns.ang_vel * lvl * osc.ang_vel] + parts
        if cfg.env.observe_only_lin_vel:
            parts = [np.ones(3) * ns.lin_vel * lvl * osc.lin_vel] + parts
        if cfg.env.observe_yaw:
            parts.append(np.zeros(1))
        if cfg.env.observe_contact_states:
            parts.append(np.ones(4) * ns.contact_states * lvl)
        vec = np.concatenate(parts)
        assert vec.shape[0] == self.num_obs, (vec.shape, self.num_obs)
        return jnp.asarray(vec, dtype=jnp.float32)

    # -- per-env domain-rand ranges (train/eval split) ---------------------
    def _dr_split(self, flag_name: str, range_name: str):
        """(lo, hi, on) per-env arrays for a domain_rand field, honoring
        the eval slice's override (reference applies eval_cfg.domain_rand
        to the eval envs, legged_robot.py:531-544 _call_train_eval)."""
        T, E = self.num_train_envs, self.num_eval_envs
        tr = self.cfg.domain_rand
        ev = self.eval_cfg.domain_rand if self.eval_cfg else tr
        tr_r = getattr(tr, range_name)
        ev_r = getattr(ev, range_name)
        lo = np.concatenate([np.full(T, tr_r[0]), np.full(E, ev_r[0])])
        hi = np.concatenate([np.full(T, tr_r[1]), np.full(E, ev_r[1])])
        on = np.concatenate([
            np.full(T, bool(getattr(tr, flag_name))),
            np.full(E, bool(getattr(ev, flag_name)))])
        return (jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
                jnp.asarray(on))

    def _dr_uniform(self, key, flag_name, range_name, default, shape_extra=()):
        """Per-env uniform sample inside the split-aware range; `default`
        where randomization is off for that split."""
        lo, hi, on = self._dr_split(flag_name, range_name)
        N = self.num_envs
        u = jax.random.uniform(key, (N,) + shape_extra)
        ex = (None,) * len(shape_extra)
        lo_b = lo[(slice(None),) + ex] if shape_extra else lo
        hi_b = hi[(slice(None),) + ex] if shape_extra else hi
        on_b = on[(slice(None),) + ex] if shape_extra else on
        return jnp.where(on_b, lo_b + u * (hi_b - lo_b), default)

    # -- initialization ---------------------------------------------------
    def init_state(self, rng: jax.Array) -> EnvState:
        """Fresh state with creation-time DR applied (reference
        _create_envs + _init_custom_buffers + _randomize_rigid_body_props,
        legged_robot.py:1481-1571, 1260-1297)."""
        N = self.num_envs
        cfg = self.cfg
        keys = jax.random.split(rng, 10)
        dr = cfg.domain_rand

        def u(key, lo, hi, shape):
            return jax.random.uniform(key, shape, minval=lo, maxval=hi)

        friction = self._dr_uniform(
            keys[0], "randomize_friction", "friction_range", 1.0)
        restitution = self._dr_uniform(
            keys[1], "randomize_restitution", "restitution_range", 0.0)
        payload = self._dr_uniform(
            keys[2], "randomize_base_mass", "added_mass_range", 0.0)
        com_disp = self._dr_uniform(
            keys[3], "randomize_com_displacement", "com_displacement_range",
            0.0, shape_extra=(3,))
        gravity_offset = (u(keys[4], *dr.gravity_range, (3,))
                          if dr.randomize_gravity else jnp.zeros(3))

        motor_strengths, motor_offsets, kp_f, kd_f = self._sample_dof_props(
            keys[5], N)

        phys = engine.PhysicsState(
            base_pos=self.env_origins + jnp.asarray(cfg.init_state.pos),
            base_quat=jnp.tile(jnp.asarray(cfg.init_state.rot), (N, 1)),
            base_lin_vel=jnp.zeros((N, 3)),
            base_ang_vel=jnp.zeros((N, 3)),
            q=jnp.tile(self.default_dof_pos, (N, 1)),
            qd=jnp.zeros((N, 12)),
        )
        n_terms = len(self.reward_names)
        z12 = jnp.zeros((N, 12))
        state = EnvState(
            phys=phys,
            rng=keys[9],
            actions=z12, last_actions=z12, last_last_actions=z12,
            joint_pos_target=z12, last_joint_pos_target=z12,
            last_last_joint_pos_target=z12,
            last_dof_vel=z12,
            lag_buffer=jnp.zeros((N, dr.lag_timesteps + 1, 12)),
            torques=z12,
            joint_pos_err_last=z12, joint_pos_err_last_last=z12,
            joint_vel_last=z12, joint_vel_last_last=z12,
            episode_length=jnp.zeros(N, jnp.int32),
            common_step=jnp.zeros((), jnp.int32),
            commands=jnp.zeros((N, 15)),
            gait_indices=jnp.zeros(N),
            clock_inputs=jnp.zeros((N, 4)),
            desired_contact_states=jnp.zeros((N, 4)),
            foot_indices=jnp.zeros((N, 4)),
            contact_forces=jnp.zeros((N, self.model.num_report_bodies, 3)),
            foot_positions=jnp.zeros((N, 4, 3)),
            foot_velocities=jnp.zeros((N, 4, 3)),
            prev_foot_velocities=jnp.zeros((N, 4, 3)),
            last_contacts=jnp.zeros((N, 4), bool),
            payloads=payload,
            com_displacements=com_disp,
            friction_coeffs=friction,
            restitutions=restitution,
            motor_strengths=motor_strengths,
            motor_offsets=motor_offsets,
            Kp_factors=kp_f,
            Kd_factors=kd_f,
            gravity_offset=gravity_offset,
            episode_sums=jnp.zeros((N, n_terms + 1)),
            command_sums=jnp.zeros((N, len(COMMAND_SUM_KEYS))),
            curriculum=curr.init_state(cfg.commands, self.curr_grid),
            curriculum_eval=(
                curr.init_state(self.eval_cfg.commands, self.curr_grid_eval)
                if self.eval_commands_differ else None),
            env_command_bins=jnp.zeros(N, jnp.int32),
            env_command_categories=jnp.zeros(N, jnp.int32),
            obs_history=jnp.zeros((N, self.num_obs_history)),
            contact_lam_t=jnp.zeros(
                (self.model.cp_body.shape[0], 3,
                 -(-N // engine.MEGASTEP_BLOCK) * engine.MEGASTEP_BLOCK)),
        )
        return state

    def _sample_dof_props(self, rng, N):
        """Motor strength/offset/Kp/Kd DR (legged_robot.py:645-665),
        split-aware per env."""
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        # motor strength / Kp / Kd: one factor per env broadcast to 12 joints
        ms = self._dr_uniform(
            k1, "randomize_motor_strength", "motor_strength_range",
            1.0)[:, None] * jnp.ones((1, 12))
        mo = self._dr_uniform(
            k2, "randomize_motor_offset", "motor_offset_range", 0.0,
            shape_extra=(12,))
        kp = self._dr_uniform(
            k3, "randomize_Kp_factor", "Kp_factor_range",
            1.0)[:, None] * jnp.ones((1, 12))
        kd = self._dr_uniform(
            k4, "randomize_Kd_factor", "Kd_factor_range",
            1.0)[:, None] * jnp.ones((1, 12))
        return ms, mo, kp, kd

    # -- torque model ------------------------------------------------------
    def _compute_torques(self, state: EnvState):
        """One substep of the torque pipeline (legged_robot.py:907-946).
        Returns (torques, updated state fields)."""
        cfg = self.cfg
        actions_scaled = state.actions * cfg.control.action_scale
        hip = jnp.asarray([1.0, 1.0, 1.0] * 4).at[0::3].set(
            cfg.control.hip_scale_reduction)
        actions_scaled = actions_scaled * hip[None, :]

        if cfg.domain_rand.randomize_lag_timesteps:
            lag = jnp.concatenate(
                [state.lag_buffer[:, 1:], actions_scaled[:, None, :]], axis=1)
            target = lag[:, 0] + self.default_dof_pos[None, :]
        else:
            lag = state.lag_buffer
            target = actions_scaled + self.default_dof_pos[None, :]

        q, qd = state.phys.q, state.phys.qd
        if cfg.control.control_type == "actuator_net":
            err = q - target + state.motor_offsets
            tau = actuator_net.eval_torques(
                self.actuator_params,
                err, state.joint_pos_err_last, state.joint_pos_err_last_last,
                qd, state.joint_vel_last, state.joint_vel_last_last)
            new_hist = dict(
                joint_pos_err_last_last=state.joint_pos_err_last,
                joint_pos_err_last=err,
                joint_vel_last_last=state.joint_vel_last,
                joint_vel_last=qd,
            )
        elif cfg.control.control_type == "P":
            tau = (self.p_gains[None, :] * state.Kp_factors
                   * (target - q + state.motor_offsets)
                   - self.d_gains[None, :] * state.Kd_factors * qd)
            new_hist = {}
        else:
            raise NameError(f"Unknown controller type: {cfg.control.control_type}")

        tau = tau * state.motor_strengths
        tau = jnp.clip(tau, -self.torque_limits, self.torque_limits)
        return tau, target, lag, new_hist

    def _substep_targets(self, state: EnvState):
        """Per-substep joint-position targets for one control step — the
        decimation-unrolled form of the lag-buffer shift in
        _compute_torques (reference legged_robot.py:907-918): substep s
        reads lag entry s+1 (or the fresh action once the buffer drains).
        Returns (targets (N, D, 12) incl. default_dof_pos, final lag
        buffer).  Used by the mega-kernel path (one Pallas launch per
        control step)."""
        cfg = self.cfg
        D = cfg.control.decimation
        N = state.actions.shape[0]
        actions_scaled = state.actions * cfg.control.action_scale
        hip = jnp.asarray([1.0, 1.0, 1.0] * 4).at[0::3].set(
            cfg.control.hip_scale_reduction)
        actions_scaled = actions_scaled * hip[None, :]
        if cfg.domain_rand.randomize_lag_timesteps:
            L = state.lag_buffer                     # (N, T, 12)
            T = L.shape[1]
            cols = [L[:, s + 1] if s + 1 < T else actions_scaled
                    for s in range(D)]
            tgt = jnp.stack(cols, axis=1) \
                + self.default_dof_pos[None, None, :]
            tail = jnp.broadcast_to(actions_scaled[:, None, :],
                                    (N, min(D, T), 12))
            lag_final = (jnp.concatenate([L[:, D:], tail], axis=1)
                         if D < T else tail[:, :T])
        else:
            tgt = jnp.broadcast_to(
                (actions_scaled + self.default_dof_pos[None, :])[:, None],
                (N, D, 12))
            lag_final = state.lag_buffer
        return tgt, lag_final

    # -- observation -------------------------------------------------------
    def _compute_obs(self, state: EnvState, base_lin_vel_b, base_ang_vel_b,
                     projected_gravity, rng):
        """Observation assembly (legged_robot.py:302-377)."""
        cfg = self.cfg
        osc = cfg.obs_scales
        parts = [projected_gravity]
        if cfg.env.observe_command:
            parts.append(state.commands[:, :cfg.commands.num_commands]
                         * self.commands_scale[None, :])
        parts.append((state.phys.q - self.default_dof_pos[None, :]) * osc.dof_pos)
        parts.append(state.phys.qd * osc.dof_vel)
        parts.append(state.actions)
        if cfg.env.observe_two_prev_actions:
            parts.append(state.last_actions)
        if cfg.env.observe_timing_parameter:
            parts.append(state.gait_indices[:, None])
        if cfg.env.observe_clock_inputs:
            parts.append(state.clock_inputs)
        obs = jnp.concatenate(parts, axis=-1)
        if cfg.env.observe_vel:
            obs = jnp.concatenate(
                [base_lin_vel_b * osc.lin_vel, base_ang_vel_b * osc.ang_vel, obs],
                axis=-1)
        if cfg.env.observe_only_lin_vel:
            obs = jnp.concatenate([base_lin_vel_b * osc.lin_vel, obs], axis=-1)
        if cfg.env.observe_yaw:
            fwd = qops.quat_apply(state.phys.base_quat, jnp.array([1.0, 0.0, 0.0]))
            heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])[:, None]
            obs = jnp.concatenate([obs, heading], axis=-1)
        if cfg.env.observe_contact_states:
            cs = (state.contact_forces[:, self.feet_indices, 2] > 1.0) * 1.0
            obs = jnp.concatenate([obs, cs], axis=-1)
        if cfg.noise.add_noise:
            noise = (2 * jax.random.uniform(rng, obs.shape) - 1)
            obs = obs + noise * self.noise_scale_vec[None, :]
        return obs

    def _compute_privileged_obs(self, state: EnvState, base_lin_vel_b):
        """Privileged observation assembly (legged_robot.py:380-491)."""
        cfg = self.cfg
        nrm = cfg.normalization
        parts = []

        def scale_shift(rng_):
            return 2.0 / (rng_[1] - rng_[0]), (rng_[1] + rng_[0]) / 2.0

        if cfg.env.priv_observe_friction:
            s, sh = scale_shift(nrm.friction_range)
            parts.append(((state.friction_coeffs - sh) * s)[:, None])
        if cfg.env.priv_observe_restitution:
            s, sh = scale_shift(nrm.restitution_range)
            parts.append(((state.restitutions - sh) * s)[:, None])
        if cfg.env.priv_observe_base_mass:
            s, sh = scale_shift(nrm.added_mass_range)
            parts.append(((state.payloads - sh) * s)[:, None])
        if cfg.env.priv_observe_com_displacement:
            s, sh = scale_shift(nrm.com_displacement_range)
            parts.append((state.com_displacements - sh) * s)
        if cfg.env.priv_observe_motor_strength:
            s, sh = scale_shift(nrm.motor_strength_range)
            parts.append((state.motor_strengths - sh) * s)
        if cfg.env.priv_observe_motor_offset:
            s, sh = scale_shift(nrm.motor_offset_range)
            parts.append((state.motor_offsets - sh) * s)
        if cfg.env.priv_observe_body_height:
            s, sh = scale_shift(nrm.body_height_range)
            parts.append(((state.phys.base_pos[:, 2] - sh) * s)[:, None])
        if cfg.env.priv_observe_body_velocity:
            s, sh = scale_shift(nrm.body_velocity_range)
            parts.append((base_lin_vel_b - sh) * s)
        if cfg.env.priv_observe_clock_inputs:
            parts.append(state.clock_inputs)
        if cfg.env.priv_observe_desired_contact_states:
            parts.append(state.desired_contact_states)
        if not parts:
            return jnp.zeros((self.num_envs, 0))
        priv = jnp.concatenate(parts, axis=-1)
        assert priv.shape[1] == self.num_privileged_obs, (
            priv.shape, self.num_privileged_obs)
        return priv

    # -- gait clocks -------------------------------------------------------
    def _step_contact_targets(self, state: EnvState):
        """Gait clock machinery (legged_robot.py:826-905)."""
        cfg = self.cfg
        if not cfg.env.observe_gait_commands:
            return state.gait_indices, state.clock_inputs, \
                state.desired_contact_states, state.foot_indices
        cmds = state.commands
        freq, phases, offsets, bounds, durations = (
            cmds[:, 4], cmds[:, 5], cmds[:, 6], cmds[:, 7], cmds[:, 8])
        gi = jnp.remainder(state.gait_indices + self.dt * freq, 1.0)
        if cfg.commands.pacing_offset:
            raw = [gi + phases + offsets + bounds, gi + bounds,
                   gi + offsets, gi + phases]
        else:
            raw = [gi + phases + offsets + bounds, gi + offsets,
                   gi + bounds, gi + phases]
        raw = jnp.stack(raw, axis=1)                       # (N, 4) FL FR RL RR
        foot_indices = jnp.remainder(raw, 1.0)
        dur = durations[:, None]
        rem = jnp.remainder(raw, 1.0)
        stance = rem * (0.5 / dur)
        swing = 0.5 + (rem - dur) * (0.5 / (1 - dur))
        xform = jnp.where(rem < dur, stance, jnp.where(rem > dur, swing, rem))
        clock = jnp.sin(2 * jnp.pi * xform)
        kappa = cfg.rewards.kappa_gait_probs
        cdf = lambda x: jstats.norm.cdf(x, loc=0.0, scale=kappa)
        x = jnp.remainder(xform, 1.0)
        desired = (cdf(x) * (1 - cdf(x - 0.5))
                   + cdf(x - 1) * (1 - cdf(x - 1.5)))
        return gi, clock, desired, foot_indices

    # -- reset helpers -----------------------------------------------------
    def _sample_reset_state(self, state: EnvState, rng):
        """Per-env reset samples (reference _reset_dofs/_reset_root_states,
        legged_robot.py:948-1001). Returns a full-batch candidate."""
        cfg = self.cfg
        N = self.num_envs
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        q = self.default_dof_pos[None, :] * jax.random.uniform(
            k1, (N, 12), minval=0.5, maxval=1.5)
        pos = self.env_origins + jnp.asarray(cfg.init_state.pos)
        xy = jax.random.uniform(
            k2, (N, 2),
            minval=jnp.asarray([-cfg.terrain.x_init_range, -cfg.terrain.y_init_range]),
            maxval=jnp.asarray([cfg.terrain.x_init_range, cfg.terrain.y_init_range]))
        if cfg.terrain.mesh_type in ("heightfield", "trimesh"):
            pos = pos.at[:, :2].add(
                xy + jnp.asarray([cfg.terrain.x_init_offset, cfg.terrain.y_init_offset]))
        yaw = jax.random.uniform(k3, (N,), minval=-cfg.terrain.yaw_init_range,
                                 maxval=cfg.terrain.yaw_init_range)
        quat = qops.quat_from_angle_axis(yaw, jnp.array([0.0, 0.0, 1.0]))
        vel6 = jax.random.uniform(k4, (N, 6), minval=-0.5, maxval=0.5)
        return engine.PhysicsState(
            base_pos=pos, base_quat=quat,
            base_lin_vel=vel6[:, :3], base_ang_vel=vel6[:, 3:],
            q=q, qd=jnp.zeros((N, 12)))

    # -- main step ---------------------------------------------------------
    def step(self, state: EnvState, actions: jnp.ndarray):
        cfg = self.cfg
        N = self.num_envs
        m = self.model
        rng, k_noise, k_resample, k_reset, k_reset_cmd, k_push, k_dof, k_grav = \
            jax.random.split(state.rng, 8)

        # 1. clip actions (legged_robot.py:66-67)
        clip_a = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)
        state = state._replace(actions=actions,
                               prev_foot_velocities=state.foot_velocities)

        # 2. decimation loop (legged_robot.py:74-81)
        gravity = state.gravity_offset + jnp.asarray([0.0, 0.0, -9.8])
        dyn = engine.DynamicsParams(
            payload=state.payloads,
            com_displacement=state.com_displacements,
            friction=state.friction_coeffs,
            restitution=state.restitutions,
            gravity=jnp.tile(gravity[None, :], (N, 1)),
        )

        if self.sim_params.use_pallas_contact and cfg.sim.megastep:
            # whole-control-step Pallas kernel: torque model + physics
            # substep(s) + integration in one launch, J/W built in-kernel
            # (ops/pallas_megastep.py).  Reuse mode runs all decimation
            # substeps in ONE call (cache anchored at the entry state);
            # exact mode calls it per substep with a fresh cache — the same
            # per-substep recomputation semantics as engine.physics_substep.
            D = cfg.control.decimation
            tgt_raw, lag_final = self._substep_targets(state)
            if cfg.control.control_type == "actuator_net":
                tgt_eff = tgt_raw - state.motor_offsets[:, None, :]
            else:
                tgt_eff = tgt_raw + state.motor_offsets[:, None, :]

            def _ctrl(st):
                if cfg.control.control_type == "actuator_net":
                    return ("actuator_net", self.actuator_blockdiag,
                            (st.joint_pos_err_last,
                             st.joint_pos_err_last_last,
                             st.joint_vel_last, st.joint_vel_last_last))
                return ("P", self.p_gains[None, :] * st.Kp_factors,
                        self.d_gains[None, :] * st.Kd_factors)

            cross_warm = (self.sim_params.contact_warm_start
                          and self.sim_params.contact_cross_step_warm_start)
            if cfg.sim.reuse_matrices:
                phys2, lam_t, p_cp_t, p_cp_prev_t, torques, hist = \
                    engine.control_step_megakernel(
                        m, self.sim_params, state.phys, dyn, self.terrain,
                        tgt_eff, state.motor_strengths, self.torque_limits,
                        _ctrl(state), D,
                        lam_in_t=(state.contact_lam_t if cross_warm
                                  else None))
                state = state._replace(phys=phys2, torques=torques, **hist)
                if cross_warm:
                    state = state._replace(contact_lam_t=lam_t)
            elif self.terrain.height.shape == (2, 2):
                # exact mode, flat ground: ONE launch for the whole
                # control step with the full cache (FK/CRBA/M^-1/J/W)
                # rebuilt from the current state before every substep
                # INSIDE the kernel — no per-substep launches, no XLA
                # cache chain, no HBM cache traffic (round-4 exact-mode
                # throughput work; semantics = engine.physics_substep)
                phys2, lam_t, p_cp_t, p_cp_prev_t, torques, hist = \
                    engine.control_step_megakernel(
                        m, self.sim_params, state.phys, dyn, self.terrain,
                        tgt_eff, state.motor_strengths, self.torque_limits,
                        _ctrl(state), D, exact=True)
                state = state._replace(phys=phys2, torques=torques, **hist)
            else:
                P_ = m.cp_body.shape[0]
                blk = engine.MEGASTEP_BLOCK
                Npad = -(-N // blk) * blk
                z_p = jnp.zeros((P_, 3, Npad), jnp.float32)

                def substep(carry, tgt_s):
                    st = carry[0]
                    phys2, lam_t, p_cp_t, p_cp_prev_t, torques, hist = \
                        engine.control_step_megakernel(
                            m, self.sim_params, st.phys, dyn, self.terrain,
                            tgt_s[:, None, :], st.motor_strengths,
                            self.torque_limits, _ctrl(st), 1)
                    st = st._replace(phys=phys2, torques=torques, **hist)
                    return (st, lam_t, p_cp_t, p_cp_prev_t), None

                (state, lam_t, p_cp_t, p_cp_prev_t), _ = jax.lax.scan(
                    substep, (state, z_p, z_p, z_p),
                    jnp.swapaxes(tgt_eff, 0, 1), length=D)
            state = state._replace(
                joint_pos_target=tgt_raw[:, -1], lag_buffer=lag_final)
            cinfo_last = engine.contact_report_from_lam_t(
                m, lam_t, self.sim_params.dt, N)
            pallas_foot = engine.foot_state_from_pcp_t(
                m, p_cp_t, p_cp_prev_t, self.sim_params.dt, N)
            p_cp_final = None
        elif self.sim_params.use_pallas_contact:
            reuse = cfg.sim.reuse_matrices
            if reuse:
                # cache anchored at the control step's first geometry,
                # contact points advanced at velocity level across substeps
                cache0 = engine.build_dynamics_cache(
                    m, self.sim_params, state.phys, dyn, self.terrain)
                p_cp0_t = cache0.pallas_ops.p_cp_t
            else:
                # exact mode: a fresh env-minor cache (FK/CRBA/M^-1/J/W)
                # per substep — same per-substep recomputation semantics as
                # engine.physics_substep, on the Pallas pipeline
                cache0 = None
                P_ = m.cp_body.shape[0]
                Npad = -(-N // 256) * 256
                p_cp0_t = jnp.zeros((P_, 3, Npad), jnp.float32)

            def substep(carry, _):
                st, p_cp_t, _, lam_prev = carry
                tau, target, lag, hist = self._compute_torques(st)
                if reuse:
                    cache = cache0
                else:
                    cache = engine.build_dynamics_cache(
                        m, self.sim_params, st.phys, dyn, self.terrain)
                    p_cp_t = cache.pallas_ops.p_cp_t   # fresh FK points
                phys2, lam_t, p_cp_new_t = engine.physics_substep_cached(
                    m, self.sim_params, st.phys, tau, dyn, self.terrain,
                    cache, p_cp_t)
                st = st._replace(phys=phys2, torques=tau,
                                 joint_pos_target=target, lag_buffer=lag,
                                 **hist)
                return (st, p_cp_new_t, p_cp_t, lam_t), None

            lam0 = jnp.zeros_like(p_cp0_t)
            (state, p_cp_t, p_cp_prev_t, lam_t), _ = jax.lax.scan(
                substep, (state, p_cp0_t, p_cp0_t, lam0), None,
                length=cfg.control.decimation)
            # forces + foot state materialized once from the last substep
            cinfo_last = engine.contact_report_from_lam_t(
                m, lam_t, self.sim_params.dt, N)
            pallas_foot = engine.foot_state_from_pcp_t(
                m, p_cp_t, p_cp_prev_t, self.sim_params.dt, N)
            p_cp_final = None
        elif cfg.sim.reuse_matrices:
            cache = engine.build_dynamics_cache(
                m, self.sim_params, state.phys, dyn)

            def substep(carry, _):
                st, p_cp = carry
                tau, target, lag, hist = self._compute_torques(st)
                phys2, cinfo, p_cp = engine.physics_substep_cached(
                    m, self.sim_params, st.phys, tau, dyn, self.terrain,
                    cache, p_cp)
                st = st._replace(phys=phys2, torques=tau,
                                 joint_pos_target=target, lag_buffer=lag,
                                 **hist)
                return (st, p_cp), cinfo

            (state, p_cp_final), cinfos = jax.lax.scan(
                substep, (state, cache.p_cp), None,
                length=cfg.control.decimation)
        else:
            def substep(carry, _):
                st = carry
                tau, target, lag, hist = self._compute_torques(st)
                phys2, cinfo = engine.physics_substep(
                    m, self.sim_params, st.phys, tau, dyn, self.terrain)
                st = st._replace(phys=phys2, torques=tau,
                                 joint_pos_target=target, lag_buffer=lag,
                                 **hist)
                return st, cinfo

            state, cinfos = jax.lax.scan(substep, state, None,
                                         length=cfg.control.decimation)
            p_cp_final = None
        if self.sim_params.use_pallas_contact:
            contact_forces = cinfo_last.report_forces
        else:
            contact_forces = jax.tree.map(lambda x: x[-1], cinfos).report_forces

        # 3. kinematic quantities (legged_robot.py:102-115)
        phys = state.phys
        episode_length = state.episode_length + 1
        common_step = state.common_step + 1
        base_lin_vel_b = qops.quat_rotate_inverse(phys.base_quat, phys.base_lin_vel)
        base_ang_vel_b = qops.quat_rotate_inverse(phys.base_quat, phys.base_ang_vel)
        gravity_unit = gravity / jnp.linalg.norm(gravity)
        gravity_vec = jnp.tile(gravity_unit[None, :], (N, 1))
        projected_gravity = qops.quat_rotate_inverse(phys.base_quat, gravity_vec)
        if self.sim_params.use_pallas_contact:
            foot_positions, foot_velocities = pallas_foot
        elif cfg.sim.reuse_matrices:
            # reuse mode: feet from the carried contact-point estimate and
            # cached Jacobians — no extra FK/twist pass
            foot_positions, foot_velocities = engine.foot_state_from_cache(
                m, cache, phys, p_cp_final)
        else:
            foot_positions, foot_velocities = \
                engine.foot_positions_velocities(m, phys)

        # 4. teleport (legged_robot.py:1028-1051)
        if cfg.terrain.teleport_robots and cfg.terrain.mesh_type in (
                "heightfield", "trimesh"):
            phys = self._teleport(phys)

        state = state._replace(
            phys=phys, episode_length=episode_length, common_step=common_step,
            contact_forces=contact_forces, foot_positions=foot_positions,
            foot_velocities=foot_velocities)

        # 5. command resampling w/ curriculum (legged_robot.py:683-686)
        if self.resample_interval_arr is not None:
            # per-split resampling cadence (eval commands cfg diverges)
            resample_mask = (
                episode_length % self.resample_interval_arr) == 0
        else:
            resample_mask = (episode_length % self.resample_interval) == 0
        state = self._resample_commands(state, resample_mask, k_resample)

        # 6. gait clocks (legged_robot.py:687)
        gi, clock, desired, foot_idx = self._step_contact_targets(state)
        state = state._replace(gait_indices=gi, clock_inputs=clock,
                               desired_contact_states=desired,
                               foot_indices=foot_idx)

        # 7. push robots (legged_robot.py:693-694, 1017-1026)
        if cfg.domain_rand.push_robots:
            push_mask = (episode_length % self.push_interval) == 0
            pv = jax.random.uniform(k_push, (N, 2),
                                    minval=-cfg.domain_rand.max_push_vel_xy,
                                    maxval=cfg.domain_rand.max_push_vel_xy)
            new_lin = jnp.where(push_mask[:, None],
                                jnp.concatenate([pv, phys.base_lin_vel[:, 2:]], -1),
                                phys.base_lin_vel)
            state = state._replace(phys=state.phys._replace(base_lin_vel=new_lin))

        # 8. periodic dof-prop DR (legged_robot.py:696-699)
        dof_rand_mask = (episode_length % self.rand_interval) == 0
        state = self._apply_dof_props_mask(state, dof_rand_mask, k_dof)

        # 9. gravity DR schedule (legged_robot.py:701-705)
        if cfg.domain_rand.randomize_gravity:
            g_key = jax.random.fold_in(k_grav, common_step)
            new_g = jax.random.uniform(
                g_key, (3,), minval=cfg.domain_rand.gravity_range[0],
                maxval=cfg.domain_rand.gravity_range[1])
            go = jnp.where((common_step % self.gravity_rand_interval) == 0,
                           new_g, state.gravity_offset)
            go = jnp.where(
                ((common_step - self.gravity_rand_duration)
                 % self.gravity_rand_interval) == 0,
                jnp.zeros(3), go)
            state = state._replace(gravity_offset=go)

        # 10. termination (legged_robot.py:138-148)
        term_f = jnp.linalg.norm(
            state.contact_forces[:, self.termination_indices, :], axis=-1)
        reset = jnp.any(term_f > 1.0, axis=1)
        time_out = episode_length > self.max_episode_length
        reset = reset | time_out
        if cfg.rewards.use_terminal_body_height:
            body_height = state.phys.base_pos[:, 2] - self._measured_ground(state)
            reset = reset | (body_height < cfg.rewards.terminal_body_height)
        # envelope guard (no reference analogue — PhysX enforces its own
        # stability internally): an env whose base velocity saturates the
        # integrator caps (SimParams.max_base_lin/ang_vel) is in an
        # unrecoverable crash state; the per-component clamp that holds it
        # finite is not momentum-consistent, so terminate instead of
        # letting it pollute the batch (round-4 seed-2 launch study,
        # runs/seed2_blowup)
        sp = self.sim_params
        env_exit = (
            jnp.max(jnp.abs(state.phys.base_lin_vel), axis=-1)
            >= 0.99 * sp.max_base_lin_vel) | (
            jnp.max(jnp.abs(state.phys.base_ang_vel), axis=-1)
            >= 0.99 * sp.max_base_ang_vel)
        reset = reset | env_exit

        # 11. rewards (legged_robot.py:263-300)
        ctx = rew_mod.RewardCtx(
            cfg=cfg, dt=self.dt, commands=state.commands,
            base_pos=state.phys.base_pos, base_quat=state.phys.base_quat,
            base_lin_vel=base_lin_vel_b, base_ang_vel=base_ang_vel_b,
            projected_gravity=projected_gravity, gravity_vec=gravity_vec,
            dof_pos=state.phys.q, default_dof_pos=self.default_dof_pos,
            dof_vel=state.phys.qd, last_dof_vel=state.last_dof_vel,
            torques=state.torques, actions=state.actions,
            last_actions=state.last_actions,
            last_last_actions=state.last_last_actions,
            joint_pos_target=state.joint_pos_target,
            last_joint_pos_target=state.last_joint_pos_target,
            last_last_joint_pos_target=state.last_last_joint_pos_target,
            contact_forces=state.contact_forces,
            foot_velocities=state.foot_velocities,
            prev_foot_velocities=state.prev_foot_velocities,
            foot_positions=state.foot_positions,
            desired_contact_states=state.desired_contact_states,
            foot_indices=state.foot_indices,
            last_contacts=state.last_contacts,
            dof_pos_limits=self.dof_pos_limits,
            feet_indices=self.feet_indices,
            penalised_indices=self.penalised_indices,
        )
        rew_total, episode_sums, command_sums = self._compute_reward(
            ctx, state, base_lin_vel_b, base_ang_vel_b)
        new_last_contacts = state.contact_forces[:, self.feet_indices, 2] > 1.0
        state = state._replace(last_contacts=new_last_contacts,
                               episode_sums=episode_sums,
                               command_sums=command_sums)

        # 12. masked auto-reset (legged_robot.py:150-239); episode stats
        # split by train/eval slice (static boundary)
        T = self.num_train_envs
        done_sums = jnp.where(reset[:, None], state.episode_sums, 0.0)
        done_len = jnp.where(reset, episode_length, 0)
        ep_sums_done = jnp.sum(done_sums[:T], axis=0)
        ep_count_done = jnp.sum(reset[:T])
        ep_len_done = jnp.sum(done_len[:T])
        eval_ep_sums_done = jnp.sum(done_sums[T:], axis=0)
        eval_ep_count_done = jnp.sum(reset[T:])
        eval_ep_len_done = jnp.sum(done_len[T:])
        state = self._reset_envs(state, reset, k_reset, k_reset_cmd)

        # 13. observations (legged_robot.py:302+) on post-reset state
        phys = state.phys
        base_lin_vel_b2 = qops.quat_rotate_inverse(phys.base_quat, phys.base_lin_vel)
        base_ang_vel_b2 = qops.quat_rotate_inverse(phys.base_quat, phys.base_ang_vel)
        projected_gravity2 = qops.quat_rotate_inverse(phys.base_quat, gravity_vec)
        obs = self._compute_obs(state, base_lin_vel_b2, base_ang_vel_b2,
                                projected_gravity2, k_noise)
        clip_o = cfg.normalization.clip_observations
        obs = jnp.clip(obs, -clip_o, clip_o)
        priv_obs = self._compute_privileged_obs(state, base_lin_vel_b2)
        priv_obs = jnp.clip(priv_obs, -clip_o, clip_o)
        obs_history = jnp.concatenate(
            [state.obs_history[:, self.num_obs:], obs], axis=-1)

        # 14. shift last_* buffers (legged_robot.py:126-131)
        state = state._replace(
            rng=rng,
            obs_history=obs_history,
            last_last_actions=state.last_actions,
            last_actions=state.actions,
            last_last_joint_pos_target=state.last_joint_pos_target,
            last_joint_pos_target=state.joint_pos_target,
            last_dof_vel=state.phys.qd,
        )

        obs_dict = {"obs": obs, "privileged_obs": priv_obs,
                    "obs_history": obs_history}
        info = StepInfo(
            time_outs=time_out, env_bins=state.env_command_bins,
            ep_sums_done=ep_sums_done, ep_count_done=ep_count_done,
            ep_len_done=ep_len_done,
            eval_ep_sums_done=eval_ep_sums_done,
            eval_ep_count_done=eval_ep_count_done,
            eval_ep_len_done=eval_ep_len_done,
            torques=state.torques,
            envelope_exits=jnp.sum(env_exit.astype(jnp.float32)))
        return state, obs_dict, rew_total, reset, info

    def _measured_ground(self, state: EnvState) -> jnp.ndarray:
        """Mean measured terrain height under each robot (N,), or 0 on flat
        ground (reference _get_heights, legged_robot.py:1772-1806; the grid
        of sample points is yaw-rotated around the base)."""
        if not self.cfg.terrain.measure_heights or self.height_points is None:
            return jnp.zeros(self.num_envs)
        pts = qops.quat_apply_yaw(
            state.phys.base_quat[:, None, :],
            self.height_points[None, :, :]) + state.phys.base_pos[:, None, :]
        h, _ = self.terrain.lookup(pts[..., 0], pts[..., 1])
        return jnp.mean(h, axis=-1)

    # -- reward assembly ---------------------------------------------------
    def make_reward_ctx(self, state):
        """Build a RewardCtx from an EnvState alone (body-frame kinematics
        recomputed) — the out-of-step entry used by the eval-metrics
        library's per-term reward dump (reference
        eval_metrics/metrics.py:66-73 calls env.reward_functions directly;
        our reward terms are pure fns of this ctx)."""
        phys = state.phys
        gravity_vec = jnp.array([0.0, 0.0, -1.0])[None, :].repeat(
            self.num_envs, axis=0)
        return rew_mod.RewardCtx(
            cfg=self.cfg, dt=self.dt, commands=state.commands,
            base_pos=phys.base_pos, base_quat=phys.base_quat,
            base_lin_vel=qops.quat_rotate_inverse(phys.base_quat,
                                                  phys.base_lin_vel),
            base_ang_vel=qops.quat_rotate_inverse(phys.base_quat,
                                                  phys.base_ang_vel),
            projected_gravity=qops.quat_rotate_inverse(phys.base_quat,
                                                       gravity_vec),
            gravity_vec=gravity_vec,
            dof_pos=phys.q, default_dof_pos=self.default_dof_pos,
            dof_vel=phys.qd, last_dof_vel=state.last_dof_vel,
            torques=state.torques, actions=state.actions,
            last_actions=state.last_actions,
            last_last_actions=state.last_last_actions,
            joint_pos_target=state.joint_pos_target,
            last_joint_pos_target=state.last_joint_pos_target,
            last_last_joint_pos_target=state.last_last_joint_pos_target,
            contact_forces=state.contact_forces,
            foot_velocities=state.foot_velocities,
            prev_foot_velocities=state.prev_foot_velocities,
            foot_positions=state.foot_positions,
            desired_contact_states=state.desired_contact_states,
            foot_indices=state.foot_indices,
            last_contacts=state.last_contacts,
            dof_pos_limits=self.dof_pos_limits,
            feet_indices=self.feet_indices,
            penalised_indices=self.penalised_indices,
        )

    def _compute_reward(self, ctx, state, base_lin_vel_b, base_ang_vel_b):
        cfg = self.cfg
        N = self.num_envs
        rew_total = jnp.zeros(N)
        rew_pos = jnp.zeros(N)
        rew_neg = jnp.zeros(N)
        ep_sums = state.episode_sums
        cmd_sums = state.command_sums
        cmd_key_idx = {k: i for i, k in enumerate(COMMAND_SUM_KEYS)}
        for i, name in enumerate(self.reward_names):
            r = rew_mod.TERMS[name](ctx) * self.reward_scales[i]
            rew_total = rew_total + r
            s = jnp.sum(r)
            rew_pos = rew_pos + jnp.where(s >= 0, r, 0.0)
            rew_neg = rew_neg + jnp.where(s < 0, r, 0.0)
            ep_sums = ep_sums.at[:, i].add(r)
            if name in cmd_key_idx:
                j = cmd_key_idx[name]
                if name in ("tracking_contacts_shaped_force",
                            "tracking_contacts_shaped_vel"):
                    # legged_robot.py:280-281: scale + rew (positive-shifted)
                    cmd_sums = cmd_sums.at[:, j].add(self.reward_scales[i] + r)
                else:
                    cmd_sums = cmd_sums.at[:, j].add(r)
        if cfg.rewards.only_positive_rewards:
            rew_total = jnp.clip(rew_total, 0.0, None)
        elif cfg.rewards.only_positive_rewards_ji22_style:
            rew_total = rew_pos * jnp.exp(rew_neg / cfg.rewards.sigma_rew_neg)
        ep_sums = ep_sums.at[:, -1].add(rew_total)
        ki = cmd_key_idx
        cmd_sums = cmd_sums.at[:, ki["lin_vel_raw"]].add(base_lin_vel_b[:, 0])
        cmd_sums = cmd_sums.at[:, ki["ang_vel_raw"]].add(base_ang_vel_b[:, 2])
        cmd_sums = cmd_sums.at[:, ki["lin_vel_residual"]].add(
            jnp.square(base_lin_vel_b[:, 0] - state.commands[:, 0]))
        cmd_sums = cmd_sums.at[:, ki["ang_vel_residual"]].add(
            jnp.square(base_ang_vel_b[:, 2] - state.commands[:, 2]))
        cmd_sums = cmd_sums.at[:, ki["ep_timesteps"]].add(1.0)
        return rew_total, ep_sums, cmd_sums

    # -- curriculum + command resampling -----------------------------------
    def _resample_commands(self, state: EnvState, mask, rng):
        """Masked _resample_commands (legged_robot.py:710-824).

        Note the reference samples from the curricula unconditionally — the
        command_curriculum flag only gates extras logging."""
        cfg = self.cfg
        if not self.eval_commands_differ:
            ep_len = min(self.max_episode_length, self.resample_interval)
            task_means = jnp.stack(
                [state.command_sums[:, i] / ep_len
                 for i in range(len(curr.TASK_KEYS))], axis=-1)
            cur = curr.update(
                state.curriculum, self.curr_grid, mask,
                state.env_command_bins, state.env_command_categories,
                task_means, self.task_thresholds)
            k_s, k_p = jax.random.split(rng)
            new_cmds, new_bins, new_cats = curr.sample(
                cur, self.curr_grid, k_s, self.num_envs)
            new_cmds = curr.postprocess_gaitwise(new_cmds, new_cats,
                                                 cfg.commands)
            cur_ev = state.curriculum_eval
        else:
            # per-split curricula: the train slice updates/samples its
            # grid, the eval slice its own over eval_cfg.commands
            # (reference _call_train_eval + _resample_commands,
            # legged_robot.py:531-544, 710-824)
            T, E = self.num_train_envs, self.num_eval_envs
            ep_tr = min(self.max_episode_length, self.resample_interval)
            ep_ev = min(self.max_episode_length,
                        int(self.eval_cfg.commands.resampling_time / self.dt))
            task_means_tr = jnp.stack(
                [state.command_sums[:T, i] / ep_tr
                 for i in range(len(curr.TASK_KEYS))], axis=-1)
            task_means_ev = jnp.stack(
                [state.command_sums[T:, i] / ep_ev
                 for i in range(len(curr.TASK_KEYS))], axis=-1)
            cur = curr.update(
                state.curriculum, self.curr_grid, mask[:T],
                state.env_command_bins[:T],
                state.env_command_categories[:T],
                task_means_tr, self.task_thresholds)
            cur_ev = curr.update(
                state.curriculum_eval, self.curr_grid_eval, mask[T:],
                state.env_command_bins[T:],
                state.env_command_categories[T:],
                task_means_ev, self.task_thresholds)
            k_tr, k_ev = jax.random.split(rng)
            cmds_tr, bins_tr, cats_tr = curr.sample(
                cur, self.curr_grid, k_tr, T)
            cmds_ev, bins_ev, cats_ev = curr.sample(
                cur_ev, self.curr_grid_eval, k_ev, E)
            cmds_tr = curr.postprocess_gaitwise(cmds_tr, cats_tr,
                                                cfg.commands)
            cmds_ev = curr.postprocess_gaitwise(cmds_ev, cats_ev,
                                                self.eval_cfg.commands)
            new_cmds = jnp.concatenate([cmds_tr, cmds_ev], axis=0)
            new_bins = jnp.concatenate([bins_tr, bins_ev], axis=0)
            new_cats = jnp.concatenate([cats_tr, cats_ev], axis=0)
        commands = jnp.where(mask[:, None], new_cmds[:, :15], state.commands)
        bins = jnp.where(mask, new_bins, state.env_command_bins)
        cats = jnp.where(mask, new_cats, state.env_command_categories)
        # reset command sums for resampled envs (legged_robot.py:822-824)
        cmd_sums = jnp.where(mask[:, None], 0.0, state.command_sums)
        return state._replace(curriculum=cur, curriculum_eval=cur_ev,
                              commands=commands,
                              env_command_bins=bins,
                              env_command_categories=cats,
                              command_sums=cmd_sums)

    def _apply_dof_props_mask(self, state: EnvState, mask, rng):
        ms, mo, kp, kd = self._sample_dof_props(rng, self.num_envs)
        mm = mask[:, None]
        return state._replace(
            motor_strengths=jnp.where(mm, ms, state.motor_strengths),
            motor_offsets=jnp.where(mm, mo, state.motor_offsets),
            Kp_factors=jnp.where(mm, kp, state.Kp_factors),
            Kd_factors=jnp.where(mm, kd, state.Kd_factors),
        )

    def _teleport(self, phys: engine.PhysicsState) -> engine.PhysicsState:
        """Edge teleport (legged_robot.py:1028-1051)."""
        tc = self.cfg.terrain
        thresh = tc.teleport_thresh
        span_x = tc.terrain_length * (tc.num_rows - 1)
        span_y = tc.terrain_width * (tc.num_cols - 1)
        x, y = phys.base_pos[:, 0], phys.base_pos[:, 1]
        x = jnp.where(x < thresh, x + span_x, x)
        x = jnp.where(x > tc.terrain_length * tc.num_rows - thresh, x - span_x, x)
        y = jnp.where(y < thresh, y + span_y, y)
        y = jnp.where(y > tc.terrain_width * tc.num_cols - thresh, y - span_y, y)
        return phys._replace(
            base_pos=jnp.stack([x, y, phys.base_pos[:, 2]], axis=-1))

    def _reset_envs(self, state: EnvState, reset_mask, rng, rng_cmd):
        """Masked reset_idx (legged_robot.py:150-239)."""
        cfg = self.cfg
        mask = reset_mask
        mm = mask[:, None]
        cand = self._sample_reset_state(state, rng)
        phys = engine.PhysicsState(
            base_pos=jnp.where(mm, cand.base_pos, state.phys.base_pos),
            base_quat=jnp.where(mm, cand.base_quat, state.phys.base_quat),
            base_lin_vel=jnp.where(mm, cand.base_lin_vel, state.phys.base_lin_vel),
            base_ang_vel=jnp.where(mm, cand.base_ang_vel, state.phys.base_ang_vel),
            q=jnp.where(mm, cand.q, state.phys.q),
            qd=jnp.where(mm, cand.qd, state.phys.qd),
        )
        state = state._replace(phys=phys)
        # resample commands for reset envs (also updates curriculum with the
        # terminated episodes' stats)
        state = self._resample_commands(state, mask, rng_cmd)
        # dof-prop DR on reset (legged_robot.py:165)
        state = self._apply_dof_props_mask(
            state, mask, jax.random.fold_in(rng, 1))
        # cross-step contact warm-start seeds are stale for reset envs:
        # zero them (env-minor layout, pad the mask to Npad)
        Npad = state.contact_lam_t.shape[-1]
        keep_t = jnp.pad(1.0 - mask.astype(state.contact_lam_t.dtype),
                         (0, Npad - mask.shape[0]))
        return state._replace(
            last_actions=jnp.where(mm, 0.0, state.last_actions),
            last_last_actions=jnp.where(mm, 0.0, state.last_last_actions),
            last_dof_vel=jnp.where(mm, 0.0, state.last_dof_vel),
            episode_length=jnp.where(mask, 0, state.episode_length),
            gait_indices=jnp.where(mask, 0.0, state.gait_indices),
            lag_buffer=jnp.where(mask[:, None, None], 0.0, state.lag_buffer),
            episode_sums=jnp.where(mm, 0.0, state.episode_sums),
            contact_lam_t=state.contact_lam_t * keep_t,
        )

    # -- public reset ------------------------------------------------------
    def reset(self, rng: jax.Array, random_episode_lengths: bool = False):
        """Full reset: fresh state, all envs reset, one zero-action step
        (reference BaseTask.reset, base_task.py:98-103)."""
        k_init, k_reset, k_cmd, k_ep, k_step = jax.random.split(rng, 5)
        state = self.init_state(k_init)
        state = self._reset_envs(state, jnp.ones(self.num_envs, bool),
                                 k_reset, k_cmd)
        if random_episode_lengths:
            state = state._replace(episode_length=jax.random.randint(
                k_ep, (self.num_envs,), 0, self.max_episode_length))
        state = state._replace(rng=k_step)
        state, obs_dict, _, _, _ = self.step(
            state, jnp.zeros((self.num_envs, self.num_actions)))
        return state, obs_dict
