"""Cross-engine physics validation against MuJoCo (the independent oracle).

The reference's physics authority is PhysX inside IsaacGym (reference:
go1_gym/envs/base/legged_robot.py:74-81, solver config
legged_robot_config.py:402-421), which cannot run in this environment.
MuJoCo is installed and serves as the independent oracle: the MJCF is
generated from the very same RobotModel the engine integrates
(models/mjcf.py), so any trajectory disagreement is attributable to the
solvers, not the model data.

Experiments (each prints a PASS/FAIL line and dumps JSON):
  box-slide     kinetic friction: slide deceleration == mu * g
  box-incline   stick below arctan(mu), slide accel g(sin t - mu cos t) above
  box-rest      resting penetration depth
  box-bounce    restitution bounce ratio (vs analytic; MuJoCo has no
                restitution parameter -- documented, engine-only check)
  go1-replay    identical torque replay from identical states: base/joint
                trajectory divergence over a 1 s horizon, for the exact,
                reuse, and warm-start solver modes
  go1-standing  steady standing: total normal force == weight in both

Run:  python scripts/mujoco_parity.py [--out runs/mujoco_parity]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU pin must go through jax.config, NOT the env var: the container
# sitecustomize imports jax first and force-sets the platform list, so the
# env-var route silently leaves the TPU backend active (observed round 5:
# the suite was contending with a concurrent training run, and crashed
# outright when the TPU tunnel was down)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

# MuJoCo oracle runs at its own numerically-comfortable settings (1 ms
# steps, default solref "0.02 1" -- MuJoCo's guideline is timeconst >=
# 2*timestep) and is sampled at the engine's 5 ms substep cadence; the
# torque schedule is held constant across each 5-microstep window.
MJ_DT = 0.001


def _engine_sim(model, sim_params, state0, torques_fn, dyn, steps, dt,
                terrain=None, reuse=False):
    """Roll our engine; torques_fn(t, state_np) -> (N,12) np torques."""
    import jax
    import jax.numpy as jnp
    from walk_these_ways_tpu.physics import engine as E

    terrain = terrain if terrain is not None else E.flat_terrain()
    state = state0
    traj = []
    if reuse:
        @jax.jit
        def ctrl(state, tau):
            cache = E.build_dynamics_cache(model, sim_params, state, dyn,
                                           terrain)
            p_cp = None
            for _ in range(4):
                state, info, p_cp = E.physics_substep_cached(
                    model, sim_params, state, tau, dyn, terrain, cache, p_cp)
            return state, info
        stride = 4
    else:
        @jax.jit
        def ctrl(state, tau):
            return E.physics_substep(model, sim_params, state, tau, dyn,
                                     terrain)
        stride = 1
    for t in range(0, steps, stride):
        tau = jnp.asarray(torques_fn(t, state), dtype=jnp.float32)
        state, info = ctrl(state, tau)
        traj.append((np.asarray(state.base_pos[0]),
                     np.asarray(state.base_quat[0]),
                     np.asarray(state.base_lin_vel[0]),
                     np.asarray(state.base_ang_vel[0]),
                     np.asarray(state.q[0]), np.asarray(state.qd[0]),
                     np.asarray(info.report_forces[0])))
    return state, traj


def _mj_sim(xml, state0_np, torques_fn, steps, dt, hold=1):
    """Roll MuJoCo with the same torque schedule; returns the trajectory in
    our conventions, sampled once per engine substep (dt), with MuJoCo
    micro-stepping at MJ_DT in between.  `hold` re-evaluates torques_fn
    only every `hold` engine steps (to mirror a lower control rate)."""
    import mujoco
    from walk_these_ways_tpu.models import mjcf

    mjm = mujoco.MjModel.from_xml_string(xml)
    sub = int(round(dt / mjm.opt.timestep))
    assert abs(sub * mjm.opt.timestep - dt) < 1e-12
    mjd = mujoco.MjData(mjm)
    pos, quat, lin, ang, q, qd = state0_np
    mjcf.set_mj_state(mjd, pos, quat, lin, ang, q, qd)
    mujoco.mj_forward(mjm, mjd)
    traj = []
    tau = None
    for t in range(steps):
        if t % hold == 0:
            tau = np.asarray(torques_fn(t, mjcf.get_mj_state(mjd)))
        if mjd.ctrl.shape[0]:
            mjd.ctrl[:] = tau[0]
        for _ in range(sub):
            mujoco.mj_step(mjm, mjd)
        p, qu, li, an, qq, dq = mjcf.get_mj_state(mjd)
        # total contact normal force on the robot (world z)
        fz = 0.0
        for c in range(mjd.ncon):
            f6 = np.zeros(6)
            mujoco.mj_contactForce(mjm, mjd, c, f6)
            # contact frame: row 0 is the normal
            R = mjd.contact[c].frame.reshape(3, 3)
            fz += (R.T @ f6[:3])[2]
        traj.append((p, qu, li, an, qq, dq, fz))
    return traj



def _tilt_deg(quat):
    """Angle between body z and world z from xyzw quaternions (deg)."""
    x, y, z, w = quat.T
    cz = 1.0 - 2.0 * (x * x + y * y)
    return np.rad2deg(np.arccos(np.clip(cz, -1.0, 1.0)))


def _traj_metrics(pos_a, qu_a, q_a, pos_b, qu_b, q_b):
    """Shared divergence metrics between two base/joint trajectories."""
    n = min(len(pos_a), len(pos_b))
    pos_a, qu_a, q_a = pos_a[:n], qu_a[:n], q_a[:n]
    pos_b, qu_b, q_b = pos_b[:n], qu_b[:n], q_b[:n]
    return dict(
        base_pos_rmse=float(np.sqrt(((pos_a - pos_b) ** 2).mean())),
        base_pos_max=float(np.abs(pos_a - pos_b).max()),
        base_z_rmse=float(np.sqrt(((pos_a[:, 2] - pos_b[:, 2]) ** 2).mean())),
        base_z_max=float(np.abs(pos_a[:, 2] - pos_b[:, 2]).max()),
        tilt_diff_max_deg=float(
            np.abs(_tilt_deg(qu_a) - _tilt_deg(qu_b)).max()),
        joint_rmse=float(np.sqrt(((q_a - q_b) ** 2).mean())),
        joint_max=float(np.abs(q_a - q_b).max()))


# ---------------------------------------------------------------------------
# box experiments
# ---------------------------------------------------------------------------


def box_setup(mu, theta=0.0, z0=0.05, v0=(0.0, 0.0, 0.0), e=0.0):
    import jax.numpy as jnp
    from walk_these_ways_tpu.models.robot import box
    from walk_these_ways_tpu.physics import engine as E

    model = box(half_extents=(0.1, 0.1, 0.05), mass=1.0)
    G = 9.81
    gvec = np.array([G * np.sin(theta), 0.0, -G * np.cos(theta)])
    N = 1
    dyn = E.DynamicsParams(
        payload=jnp.zeros(N), com_displacement=jnp.zeros((N, 3)),
        friction=jnp.full((N,), 2 * mu - 1.0), restitution=jnp.full((N,), e),
        gravity=jnp.asarray(gvec, dtype=jnp.float32)[None])
    state = E.PhysicsState(
        base_pos=jnp.asarray([[0.0, 0.0, z0]], dtype=jnp.float32),
        base_quat=jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=jnp.float32),
        base_lin_vel=jnp.asarray([v0], dtype=jnp.float32),
        base_ang_vel=jnp.zeros((N, 3)),
        q=jnp.zeros((N, 0)), qd=jnp.zeros((N, 0)))
    return model, dyn, state, gvec


def run_box_slide(out):
    """Kinetic friction on flat ground: v0 = 2 m/s, mu = 0.5 ->
    deceleration mu*g until stop; compare v(t) ours vs MuJoCo vs analytic."""
    import dataclasses
    from walk_these_ways_tpu.models import mjcf
    from walk_these_ways_tpu.physics import engine as E

    MU, DT, STEPS, V0 = 0.5, 0.005, 120, 2.0
    model, dyn, state, gvec = box_setup(MU, v0=(V0, 0.0, 0.0))
    params = E.SimParams(dt=DT, use_pallas_contact=False)
    zero_tau = lambda t, s: np.zeros((1, 0))
    _, ours = _engine_sim(model, params, state, zero_tau, dyn, STEPS, DT)

    xml = mjcf.go1_mjcf(model, mu=MU, timestep=MJ_DT,
                        gravity=(0.0, 0.0, -9.81))
    st0 = (np.array([0.0, 0.0, 0.05]), np.array([0.0, 0.0, 0.0, 1.0]),
           np.array([V0, 0.0, 0.0]), np.zeros(3), np.zeros(0), np.zeros(0))
    mj = _mj_sim(xml, st0, lambda t, s: np.zeros((1, 0)), STEPS, DT)

    t = (np.arange(STEPS) + 1) * DT
    v_ours = np.array([r[2][0] for r in ours])
    v_mj = np.array([r[2][0] for r in mj])
    v_ana = np.maximum(V0 - MU * 9.81 * t, 0.0)
    # compare only while sliding (analytic stop at 0.408 s)
    sl = t < (V0 / (MU * 9.81)) * 0.9
    err_ours = float(np.abs(v_ours[sl] - v_ana[sl]).max())
    err_mj = float(np.abs(v_mj[sl] - v_ana[sl]).max())
    err_x = float(np.abs(v_ours[sl] - v_mj[sl]).max())
    res = dict(experiment="box-slide", mu=MU, v0=V0,
               max_err_vs_analytic_ours=err_ours,
               max_err_vs_analytic_mujoco=err_mj,
               max_err_ours_vs_mujoco=err_x,
               v_final_ours=float(v_ours[-1]), v_final_mj=float(v_mj[-1]))
    ok = err_ours < 0.03 and err_x < 0.05
    _report(out, res, ok)
    return ok


def run_box_incline(out):
    """Stick below arctan(mu); above it slide with accel g(sin-mu cos)."""
    from walk_these_ways_tpu.models import mjcf
    from walk_these_ways_tpu.physics import engine as E

    MU, DT, STEPS = 0.4, 0.005, 200
    crit = np.arctan(MU)
    results = []
    ok = True
    for name, theta in (("below", crit - np.deg2rad(4.0)),
                        ("above", crit + np.deg2rad(8.0))):
        model, dyn, state, gvec = box_setup(MU, theta=theta)
        params = E.SimParams(dt=DT, use_pallas_contact=False)
        _, ours = _engine_sim(model, params, state,
                              lambda t, s: np.zeros((1, 0)), dyn, STEPS, DT)
        xml = mjcf.go1_mjcf(model, mu=MU, timestep=MJ_DT, gravity=tuple(gvec))
        st0 = (np.array([0.0, 0.0, 0.05]), np.array([0.0, 0.0, 0.0, 1.0]),
               np.zeros(3), np.zeros(3), np.zeros(0), np.zeros(0))
        mj = _mj_sim(xml, st0, lambda t, s: np.zeros((1, 0)), STEPS, DT)
        t = (np.arange(STEPS) + 1) * DT
        vx_o = np.array([r[2][0] for r in ours])
        vx_m = np.array([r[2][0] for r in mj])
        w = t > 0.5
        a_o = np.polyfit(t[w], vx_o[w], 1)[0]
        a_m = np.polyfit(t[w], vx_m[w], 1)[0]
        a_ana = max(9.81 * (np.sin(theta) - MU * np.cos(theta)), 0.0)
        results.append(dict(case=name, theta_deg=float(np.rad2deg(theta)),
                            accel_ours=float(a_o), accel_mujoco=float(a_m),
                            accel_analytic=float(a_ana)))
        if name == "below":
            ok &= abs(a_o) < 0.02 and abs(a_m) < 0.02
        else:
            ok &= abs(a_o - a_ana) < 0.05 and abs(a_o - a_m) < 0.08
    res = dict(experiment="box-incline", mu=MU, cases=results)
    _report(out, res, ok)
    return ok


def run_box_rest(out):
    """Resting penetration: ours should settle within contact_slop (2 mm);
    MuJoCo's soft contact settles at its own solimp scale."""
    from walk_these_ways_tpu.models import mjcf
    from walk_these_ways_tpu.physics import engine as E

    DT, STEPS = 0.005, 300
    model, dyn, state, _ = box_setup(0.8, z0=0.06)
    params = E.SimParams(dt=DT, use_pallas_contact=False)
    st, ours = _engine_sim(model, params, state,
                           lambda t, s: np.zeros((1, 0)), dyn, STEPS, DT)
    z_o = float(np.asarray(st.base_pos[0, 2]))
    xml = mjcf.go1_mjcf(model, mu=0.8, timestep=MJ_DT)
    st0 = (np.array([0.0, 0.0, 0.06]), np.array([0.0, 0.0, 0.0, 1.0]),
           np.zeros(3), np.zeros(3), np.zeros(0), np.zeros(0))
    mj = _mj_sim(xml, st0, lambda t, s: np.zeros((1, 0)), STEPS, DT)
    z_m = float(mj[-1][0][2])
    pen_o = 0.05 - z_o
    pen_m = 0.05 - z_m
    res = dict(experiment="box-rest", rest_height_ours=z_o,
               rest_height_mujoco=z_m, penetration_ours=pen_o,
               penetration_mujoco=pen_m, contact_slop=params.contact_slop)
    ok = abs(pen_o) < params.contact_slop + 1e-3
    _report(out, res, ok)
    return ok


def run_box_bounce(out):
    """Restitution: drop from h0 with e = 0.5 -> rebound apex ~ e^2 h0.
    Engine-only vs analytic (MuJoCo has no restitution coefficient --
    its solref model is a damped spring, documented here)."""
    from walk_these_ways_tpu.physics import engine as E

    DT, STEPS, E_R, H0 = 0.0025, 800, 0.5, 0.3
    model, dyn, state, _ = box_setup(0.8, z0=0.05 + H0, e=E_R)
    params = E.SimParams(dt=DT, use_pallas_contact=False)
    _, ours = _engine_sim(model, params, state,
                          lambda t, s: np.zeros((1, 0)), dyn, STEPS, DT)
    z = np.array([r[0][2] for r in ours])
    # first rebound apex after the first impact
    imp = np.argmax(z < 0.051)
    apex = float(z[imp:].max() - 0.05)
    ratio = apex / H0
    res = dict(experiment="box-bounce", e=E_R, drop_height=H0,
               rebound_apex=apex, measured_ratio=ratio,
               analytic_ratio=E_R * E_R,
               note="MuJoCo ships no restitution coefficient; engine-only "
                    "check vs analytic e^2 h0")
    # velocity-level restitution at finite dt underestimates the apex by
    # up to one substep of gravity; accept 20% relative
    ok = abs(ratio - E_R * E_R) < 0.2 * E_R * E_R + 0.02
    _report(out, res, ok)
    return ok


# ---------------------------------------------------------------------------
# go1 experiments
# ---------------------------------------------------------------------------


def _go1_init(z0=0.32):
    import jax.numpy as jnp
    from walk_these_ways_tpu.go1_config import GO1_DEFAULT_JOINT_ANGLES
    from walk_these_ways_tpu.models.robot import default_dof_pos, go1
    from walk_these_ways_tpu.physics import engine as E

    model = go1()
    ddp = np.asarray(default_dof_pos(model, dict(GO1_DEFAULT_JOINT_ANGLES)))
    N = 1
    dyn = E.identity_dynamics_params(N)
    state = E.PhysicsState(
        base_pos=jnp.asarray([[0.0, 0.0, z0]], dtype=jnp.float32),
        base_quat=jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=jnp.float32),
        base_lin_vel=jnp.zeros((N, 3)), base_ang_vel=jnp.zeros((N, 3)),
        q=jnp.asarray(ddp, dtype=jnp.float32)[None], qd=jnp.zeros((N, 12)))
    return model, dyn, state, ddp


def run_go1_standing(out):
    """Steady standing under a constant default-pose PD hold: total normal
    force == weight in both engines; base settles at a similar height."""
    import dataclasses
    from walk_these_ways_tpu.models import mjcf
    from walk_these_ways_tpu.physics import engine as E

    DT, STEPS = 0.005, 400
    model, dyn, state, ddp = _go1_init()
    params = E.SimParams(dt=DT, use_pallas_contact=False)
    lim = np.asarray(model.dof_effort)
    kp, kd = 40.0, 1.0

    def tau_ours(t, st):
        q = np.asarray(st.q[0])
        qd = np.asarray(st.qd[0])
        return np.clip(kp * (ddp - q) - kd * qd, -lim, lim)[None]

    st, ours = _engine_sim(model, params, state, tau_ours, dyn, STEPS, DT)
    fz_ours = float(np.asarray(ours[-1][6])[:, 2].sum())
    z_ours = float(np.asarray(st.base_pos[0, 2]))

    xml = mjcf.go1_mjcf(model, mu=1.0, timestep=MJ_DT)
    st0 = (np.array([0.0, 0.0, 0.32]), np.array([0.0, 0.0, 0.0, 1.0]),
           np.zeros(3), np.zeros(3), ddp.copy(), np.zeros(12))

    # closed-loop PD inside MuJoCo needs its own state: use a stateful fn
    import mujoco
    mjm = mujoco.MjModel.from_xml_string(xml)
    mjd = mujoco.MjData(mjm)
    mjcf.set_mj_state(mjd, *st0)
    mujoco.mj_forward(mjm, mjd)
    for t in range(int(STEPS * DT / MJ_DT)):
        q = np.array(mjd.qpos[7:])
        qd = np.array(mjd.qvel[6:])
        mjd.ctrl[:] = np.clip(kp * (ddp - q) - kd * qd, -lim, lim)
        mujoco.mj_step(mjm, mjd)
    fz_mj = 0.0
    for c in range(mjd.ncon):
        f6 = np.zeros(6)
        mujoco.mj_contactForce(mjm, mjd, c, f6)
        R = mjd.contact[c].frame.reshape(3, 3)
        fz_mj += (R.T @ f6[:3])[2]
    z_mj = float(mjd.qpos[2])

    weight = float(np.sum(model.mass) * 9.81)
    res = dict(experiment="go1-standing", weight=weight,
               fz_ours=fz_ours, fz_mujoco=float(fz_mj),
               stand_height_ours=z_ours, stand_height_mujoco=z_mj)
    ok = (abs(fz_ours - weight) / weight < 0.05
          and abs(fz_mj - weight) / weight < 0.05
          and abs(z_ours - z_mj) < 0.03)
    _report(out, res, ok)
    return ok


def run_go1_replay(out):
    """Closed-loop PD replay: both engines run the SAME 200 Hz PD law
    toward the same sinusoidal joint-target schedule (within limits) from
    identical initial states, and the resulting base/joint trajectories
    are compared over 2 s.  Open-loop torque replay is NOT used: contact-
    rich dynamics are chaotic, so identical torques diverge exponentially
    in ANY pair of correct engines; the closed-loop protocol keeps both
    on the task attractor and measures solver-level agreement.  Run for
    the exact, reuse, and warm-start solver modes to also quantify the
    approximation cost of matrix reuse (round-3 verdict item 1c)."""
    import dataclasses
    from walk_these_ways_tpu.models import mjcf
    from walk_these_ways_tpu.physics import engine as E

    DT, STEPS = 0.005, 400
    model, dyn, state, ddp = _go1_init()
    lim = np.asarray(model.dof_effort)
    kp, kd = 20.0, 0.5
    # moderate bodyweight-shifting dance: probes stance contact forces and
    # load transfer without approaching tip-over (tip-over onset is
    # chaotic, where ANY two correct engines diverge qualitatively)
    amp = np.array([0.06, 0.15, 0.15] * 4)
    phases = np.arange(12) * 0.7

    def target(t):
        return ddp + amp * np.sin(2 * np.pi * 1.0 * t * DT + phases)

    def tau_ours(t, st):
        q = np.asarray(st.q[0])
        qd = np.asarray(st.qd[0])
        return np.clip(kp * (target(t) - q) - kd * qd, -lim, lim)[None]

    def tau_mj(t, mj_state):
        q, qd = mj_state[4], mj_state[5]
        return np.clip(kp * (target(t) - q) - kd * qd, -lim, lim)[None]

    xml = mjcf.go1_mjcf(model, mu=1.0, timestep=MJ_DT)
    st0 = (np.array([0.0, 0.0, 0.32]), np.array([0.0, 0.0, 0.0, 1.0]),
           np.zeros(3), np.zeros(3), ddp.copy(), np.zeros(12))

    res = dict(experiment="go1-replay", horizon_s=STEPS * DT, modes={})
    # exact mode runs PD at 200 Hz (every substep); reuse mode applies one
    # torque per 4-substep control step, so its MuJoCo counterpart holds
    # torques for 4 steps too (fair comparison at 50 Hz).  The megastep/
    # warm-start Pallas path is not re-run here: it is parity-tested
    # against the XLA cached path in tests/test_pallas_megastep.py and
    # tests/test_warm_start.py, which chains it to this oracle.
    # exact50 isolates the control-rate effect: same exact solver, same
    # 50 Hz torque hold as reuse mode — the reuse-vs-exact50 gap is then
    # attributable to the matrix-reuse approximation alone
    def hold4(fn):
        cache = {}
        def wrapped(t, st):
            if t % 4 == 0:
                cache["tau"] = fn(t, st)
            return cache["tau"]
        return wrapped

    mj_by_rate = {}   # the MuJoCo side depends only on the hold rate —
    # reuse one rollout per rate across modes and the chaos floor below

    def mj_at(rate):
        if rate not in mj_by_rate:
            mj_by_rate[rate] = _mj_sim(xml, st0, tau_mj, STEPS, DT,
                                       hold=rate)
        return mj_by_rate[rate]

    for mode, reuse, rate in (("exact", False, 1), ("exact50", False, 4),
                              ("reuse", True, 4)):
        params = E.SimParams(dt=DT, use_pallas_contact=False)
        fn = tau_ours if rate == 1 or reuse else hold4(tau_ours)
        _, ours = _engine_sim(model, params, state, fn, dyn, STEPS,
                              DT, reuse=reuse)
        stride = 4 if reuse else 1
        mj = mj_at(rate)
        pos_mj = np.array([r[0] for r in mj])
        quat_mj = np.array([r[1] for r in mj])
        q_mj = np.array([r[4] for r in mj])
        pos_o = np.array([r[0] for r in ours])
        quat_o = np.array([r[1] for r in ours])
        q_o = np.array([r[4] for r in ours])
        p_m = pos_mj[stride - 1::stride][:len(pos_o)]
        qu_m = quat_mj[stride - 1::stride][:len(pos_o)]
        q_m = q_mj[stride - 1::stride][:len(q_o)]
        res["modes"][mode] = _traj_metrics(pos_o, quat_o, q_o,
                                           p_m, qu_m, q_m)
    # -- chaos floor (round-4 verdict item 3a): how far does MuJoCo
    # diverge from ITSELF over this horizon under the same 50 Hz hold,
    # when (a) the initial joint velocities are perturbed by 1e-6, and
    # (b) the micro-timestep is halved?  Contact-rich closed-loop
    # dynamics are chaotic, so this intra-oracle spread is the floor
    # below which cross-engine divergence is indistinguishable from
    # numerical noise — the exact50/reuse numbers above must be read
    # against it, not against zero.
    def _mj_pair_metrics(a, b):
        return _traj_metrics(
            np.array([r[0] for r in a]), np.array([r[1] for r in a]),
            np.array([r[4] for r in a]),
            np.array([r[0] for r in b]), np.array([r[1] for r in b]),
            np.array([r[4] for r in b]))

    mj_ref = mj_at(4)
    st0_pert = (st0[0], st0[1], st0[2], st0[3], st0[4],
                st0[5] + 1e-6 * np.arange(1, 13))
    mj_pert = _mj_sim(xml, st0_pert, tau_mj, STEPS, DT, hold=4)
    xml_half = mjcf.go1_mjcf(model, mu=1.0, timestep=MJ_DT / 2)
    mj_half = _mj_sim(xml_half, st0, tau_mj, STEPS, DT, hold=4)
    res["mj_selfdiv"] = dict(
        perturb_qd_1e6=_mj_pair_metrics(mj_ref, mj_pert),
        halved_timestep=_mj_pair_metrics(mj_ref, mj_half),
        note="MuJoCo-vs-MuJoCo divergence under the 50 Hz hold; the "
             "chaos floor for reading the exact50/reuse cross-engine "
             "numbers")

    exact_m = res["modes"]["exact"]
    reuse_m = res["modes"]["reuse"]
    e50_m = res["modes"]["exact50"]
    # gates: xy position is a random-walk integral of stance micro-slip
    # and is reported but not gated; height, tilt, and joint tracking are
    # the solver-level quantities.  Thresholds = round-4 measured values
    # (runs/mujoco_parity) with ~2x margin.
    ok = (exact_m["base_z_rmse"] < 0.03 and exact_m["base_z_max"] < 0.10
          and exact_m["tilt_diff_max_deg"] < 12.0
          and exact_m["joint_rmse"] < 0.20)
    ok &= (reuse_m["base_z_rmse"] < 2.5 * e50_m["base_z_rmse"] + 0.015
           and reuse_m["joint_rmse"] < 2.5 * e50_m["joint_rmse"] + 0.03)
    _report(out, res, ok)
    return ok


def run_go1_replay_actuator(out):
    """Closed-loop replay through the LEARNED MOTOR MODEL (round-4 verdict
    item 3b): both engines run the same joint-target dance, but torques
    come from the converted reference actuator network fed through the
    6-control-step lag buffer — the shipping MoB torque path (reference
    legged_robot.py:907-918 lag shift, :930-938 net eval, play config
    lag_timesteps=6) — instead of plain PD.  This checks cross-engine
    agreement exactly where sim-to-real fidelity lives: the learned
    torque law's interaction with contact.  Each engine keeps its OWN
    error/velocity histories (the net is stateful), evaluated per 5 ms
    substep like the env does.
    """
    from walk_these_ways_tpu.models import mjcf
    from walk_these_ways_tpu.physics import engine as E

    DT, STEPS, LAG = 0.005, 400, 6
    model, dyn, state, ddp = _go1_init()
    lim = np.asarray(model.dof_effort)
    amp = np.array([0.06, 0.15, 0.15] * 4)
    phases = np.arange(12) * 0.7

    def target(t):
        return ddp + amp * np.sin(2 * np.pi * 1.0 * t * DT + phases)

    # numpy forward of the converted net (models/actuator_net.py apply)
    z = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "resources", "actuator_nets",
        "unitree_go1.npz"))
    w0, b0, w1, b1, w2, b2 = (z[k] for k in ("w0", "b0", "w1", "b1",
                                             "w2", "b2"))

    def net(x):  # (12, 6) -> (12,)
        s = lambda v: v / (1.0 + np.abs(v))
        h = s(x @ w0.T + b0)
        h = s(h @ w1.T + b1)
        return (h @ w2.T + b2)[:, 0]

    # pin the host-side forward to the shipping jax implementation so the
    # two cannot drift (models/actuator_net.apply is the training path)
    from walk_these_ways_tpu.models import actuator_net as anet
    _probe = np.random.RandomState(0).uniform(-1, 1, (12, 6)).astype(
        np.float32)
    assert np.allclose(net(_probe),
                       np.asarray(anet.apply(anet.load(), _probe)),
                       atol=1e-5), "host-side actuator net drifted"

    def make_law(get_qqd):
        """Stateful torque law mirroring the shipping substep pipeline
        (go1_env._compute_torques / reference legged_robot.py:907-918):
        the lag buffer shifts EVERY 5 ms substep and is fed the CURRENT
        control step's target (held constant across its 4 substeps, like
        the action is), so lag_timesteps=6 means a 6-substep (30 ms)
        delay; the net's error/velocity histories are 2-deep and also
        advance per substep."""
        st = dict(lag=[ddp.copy()] * (LAG + 1),
                  el=np.zeros(12), ell=np.zeros(12),
                  vl=np.zeros(12), vll=np.zeros(12))

        def law(t, engine_state):
            q, qd = get_qqd(engine_state)
            st["lag"] = st["lag"][1:] + [target(t - (t % 4))]
            err = q - st["lag"][0]
            x = np.stack([err, st["el"], st["ell"],
                          qd, st["vl"], st["vll"]], axis=-1)
            tau = np.clip(net(x), -lim, lim)
            st["ell"], st["el"] = st["el"], err
            st["vll"], st["vl"] = st["vl"], qd
            return tau[None]
        return law

    params = E.SimParams(dt=DT, use_pallas_contact=False)
    law_ours = make_law(lambda s: (np.asarray(s.q[0]), np.asarray(s.qd[0])))
    _, ours = _engine_sim(model, params, state, law_ours, dyn, STEPS, DT)

    xml = mjcf.go1_mjcf(model, mu=1.0, timestep=MJ_DT)
    st0 = (np.array([0.0, 0.0, 0.32]), np.array([0.0, 0.0, 0.0, 1.0]),
           np.zeros(3), np.zeros(3), ddp.copy(), np.zeros(12))
    law_mj = make_law(lambda s: (s[4], s[5]))
    mj = _mj_sim(xml, st0, law_mj, STEPS, DT, hold=1)

    pos_o = np.array([r[0] for r in ours]); pos_m = np.array([r[0] for r in mj])
    qu_o = np.array([r[1] for r in ours]); qu_m = np.array([r[1] for r in mj])
    q_o = np.array([r[4] for r in ours]); q_m = np.array([r[4] for r in mj])
    res = dict(experiment="go1-replay-actuator", horizon_s=STEPS * DT,
               lag_substeps=LAG,
               **_traj_metrics(pos_o, qu_o, q_o, pos_m, qu_m, q_m),
               final_z_ours=float(pos_o[-1, 2]),
               final_z_mj=float(pos_m[-1, 2]))
    # gates mirror the exact-mode PD replay's (measured values + ~2x)
    ok = (res["base_z_rmse"] < 0.03 and res["base_z_max"] < 0.10
          and res["tilt_diff_max_deg"] < 12.0 and res["joint_rmse"] < 0.20)
    _report(out, res, ok)
    return ok


def _report(out, res, ok):
    res["pass"] = bool(ok)
    name = res["experiment"]
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, f"{name}.json"), "w") as f:
        json.dump(res, f, indent=1)
    line = {k: v for k, v in res.items() if not isinstance(v, (dict, list))}
    print(("PASS " if ok else "FAIL ") + json.dumps(line), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/mujoco_parity")
    ap.add_argument("--only", default=None)
    a = ap.parse_args()
    exps = dict(box_slide=run_box_slide, box_incline=run_box_incline,
                box_rest=run_box_rest, box_bounce=run_box_bounce,
                go1_standing=run_go1_standing, go1_replay=run_go1_replay,
                go1_replay_actuator=run_go1_replay_actuator)
    if a.only:
        exps = {a.only: exps[a.only]}
    results = {name: bool(fn(a.out)) for name, fn in exps.items()}
    print(json.dumps(results))
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
