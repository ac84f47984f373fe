"""Pallas TPU kernel for the WHOLE control step, env-minor.

Round-2 final profile of the 9x pipeline (scripts/profile_train.py):
the per-substep dynamics kernel (ops/pallas_dynamics.py) was the top op
at 35% of the train iteration, and within it the dominant costs were
fixed per-launch: every one of the `decimation` substep calls re-read
the full dynamics cache (J/W/M^-1/twist bases, ~2.8 MB per 256-env
block) from HBM, and the glue between launches (torque model, base-pose
integration, env-minor<->N-major transposes of the state) ran as dozens
of small N-major XLA ops per substep.

This kernel runs the ENTIRE control step in one launch:

- the contact-cache build (J + W, ops/pallas_contact.cache_core) runs
  once at kernel start — J never round-trips through HBM at all;
- all `decimation` substeps run back-to-back in VMEM, each one:
  torque model (PD or the Go1 actuator network as block-diagonal MXU
  matmuls over the 12 joints) -> joint-limit torques -> unconstrained
  dynamics (ops/pallas_dynamics.dyn_core) -> contact solve
  (ops/pallas_contact.contact_core) -> velocity clips -> base/joint
  integration including the quaternion exp map;
- the carried state (q, qd, base pose, contact points, actuator-net
  histories) only touches HBM once on entry and once on exit per
  control step.

Semantics are an exact reformulation of the per-substep path:
envs/go1_env.py:_compute_torques (reference legged_robot.py:907-946) for
the torque model, physics/engine.py:physics_substep_cached for dynamics,
contact, clips and integration (reference PhysX step semantics, SURVEY.md
§2.1).  Parity-tested against that path in tests/test_pallas_megastep.py.

The actuator network (MLP 6->32->32->1 per joint, softsign; reference
scripts/actuator_net/utils.py:66-79) is evaluated for all 12 joints in
three MXU matmuls using block-diagonal weight matrices built once on the
host (`blockdiag_actuator_weights`): with features stacked as
X[12f+j] = feature f of joint j, W0b[32j+o, 12f+j] = w0[o, f] etc., so
one (384, 72) x (72, B) dot replaces 12 per-joint (32, 6) dots.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_contact as pc
from . import pallas_dynamics as pd
from .pallas_contact import _spec
from ..physics import envminor as _envminor


def blockdiag_actuator_weights(params):
    """ActuatorNetParams -> block-diagonal (W0b (384, 72), b0b (384, 1),
    W1b (384, 384), b1b (384, 1), W2b (12, 384), b2b (12, 1)) so the
    12 per-joint MLPs evaluate as three MXU matmuls on feature-stacked
    inputs X (72, B) with X[12f + j] = feature f of joint j."""
    w0 = np.asarray(params.w0, np.float32)   # (32, 6)
    b0 = np.asarray(params.b0, np.float32)
    w1 = np.asarray(params.w1, np.float32)   # (32, 32)
    b1 = np.asarray(params.b1, np.float32)
    w2 = np.asarray(params.w2, np.float32)   # (1, 32)
    b2 = np.asarray(params.b2, np.float32)
    H, F = w0.shape                          # 32, 6
    J = 12
    W0b = np.zeros((J * H, J * F), np.float32)
    W1b = np.zeros((J * H, J * H), np.float32)
    W2b = np.zeros((J, J * H), np.float32)
    for j in range(J):
        for f in range(F):
            W0b[j * H:(j + 1) * H, f * J + j] = w0[:, f]
        W1b[j * H:(j + 1) * H, j * H:(j + 1) * H] = w1
        W2b[j, j * H:(j + 1) * H] = w2[0]
    b0b = np.tile(b0, J)[:, None]
    b1b = np.tile(b1, J)[:, None]
    b2b = np.full((J, 1), float(b2[0]), np.float32)
    return tuple(jnp.asarray(x) for x in (W0b, b0b, W1b, b1b, W2b, b2b))


def _softsign(x):
    return x / (1.0 + jnp.abs(x))


def _cross3(a, b):
    """(3, B) x (3, B) -> (3, B)."""
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)


def _quat_integrate(quat, omega, dt):
    """(4, B) xyzw rows, (3, B) world angular velocity -> (4, B).
    Matches ops/quat.py:quat_integrate step for step (norm guard, axis
    renormalization inside quat_from_angle_axis, final normalize)."""
    angle = jnp.sqrt(omega[0:1] ** 2 + omega[1:2] ** 2
                     + omega[2:3] ** 2)                     # (1, B)
    axis = omega / jnp.maximum(angle, 1e-9)
    # quat_from_angle_axis re-normalizes the axis
    an = jnp.sqrt(axis[0:1] ** 2 + axis[1:2] ** 2 + axis[2:3] ** 2)
    axis = axis / jnp.maximum(an, 1e-9)
    half = 0.5 * (angle * dt)
    s = jnp.sin(half)
    dq = jnp.concatenate([axis * s, jnp.cos(half)], axis=0)  # (4, B)
    dx, dy, dz, dw = dq[0:1], dq[1:2], dq[2:3], dq[3:4]
    qx, qy, qz, qw = quat[0:1], quat[1:2], quat[2:3], quat[3:4]
    rx = dw * qx + dx * qw + dy * qz - dz * qy
    ry = dw * qy - dx * qz + dy * qw + dz * qx
    rz = dw * qz + dx * qy - dy * qx + dz * qw
    rw = dw * qw - dx * qx - dy * qy - dz * qz
    norm = jnp.sqrt(rx * rx + ry * ry + rz * rz + rw * rw)
    inv = 1.0 / jnp.maximum(norm, 1e-9)
    return jnp.concatenate([rx, ry, rz, rw], axis=0) * inv


def _cache_arrays(model, q, quat, pos, payload, comdisp):
    """Exact-mode in-kernel cache rebuild from the CURRENT state:
    envminor.cache_columns (FK + twist bases + inertia blocks + block
    CRBA + closed-form M^-1) on VMEM rows, stacked into the array
    layouts cache_core/dyn_core consume.  The reference point is the
    current base position (delta = 0), exactly like
    engine.physics_substep.

    VPU-utilization note: the chain is a few thousand independent
    "scalar" ops over the env batch.  On a flat (1, B) row each op fills
    only one of the VPU's 8 sublanes, so the exact path carries the env
    batch pre-split as (..., 8, B/8) — done on the HOST side
    (engine.control_step_megakernel), since Mosaic cannot lower the
    sublane<->lane shape cast in-kernel — and every scalar op here is a
    full-height (8, B/8) tile."""
    nb, nj = model.nb, model.nj
    q_cols = [q[j] for j in range(nj)]
    quat_cols = [quat[i] for i in range(4)]
    ref = [pos[i] for i in range(3)]
    cd = [comdisp[i] for i in range(3)]
    Sw, Sv, Minv, A_blk, B_blk, mb, r_cp, p_cp = _envminor.cache_columns(
        model, q_cols, quat_cols, ref, payload[0], cd)
    stk = jnp.stack
    Sw_a = stk([stk(v, axis=0) for v in Sw], axis=0)     # (nv, 3, ...)
    Sv_a = stk([stk(v, axis=0) for v in Sv], axis=0)
    Minv_a = stk([stk(row, axis=0) for row in Minv], axis=0)
    A9 = stk([stk([A_blk[b][i][j] for i in range(3) for j in range(3)],
                  axis=0) for b in range(nb)], axis=0)   # (nb, 9, ...)
    B9 = stk([stk([B_blk[b][i][j] for i in range(3) for j in range(3)],
                  axis=0) for b in range(nb)], axis=0)
    m_a = stk(mb, axis=0)                                # (nb, ...)
    r_a = stk([stk(v, axis=0) for v in r_cp], axis=0)    # (P, 3, ...)
    pcp_a = stk([stk(v, axis=0) for v in p_cp], axis=0)
    return Sw_a, Sv_a, A9, B9, m_a, Minv_a, r_a, pcp_a


def _megastep_kernel(*refs,
                     anc: np.ndarray, joint_body: np.ndarray, groups: tuple,
                     nb: int, nj: int, nv: int, P: int, D: int, dt: float,
                     num_iters: int, warm_iters: int, warm0: bool,
                     relaxation: float, baumgarte: float,
                     slop: float, max_depen: float, bounce_thresh: float,
                     contact: bool, flat: bool, control_type: str,
                     limit_stiffness: float, limit_damping: float,
                     max_base_ang_vel: float, max_base_lin_vel: float,
                     eps: float, exact: bool = False, model=None):
    it = iter(refs)

    def nxt():
        return next(it)[:]

    anc_pn = nxt()            # (P, nv)
    if exact:
        payload = nxt()       # (1, B)
        comdisp = nxt()       # (3, B)
    else:
        Sw = nxt()            # (nv, 3, B)
        Sv = nxt()
        Ab = nxt()            # (nb, 9, B)
        Bb = nxt()
        mb = nxt()            # (nb, B)
        Minv = nxt()          # (nv, nv, B)
        pcp = nxt()           # (P, 3, B)
    rh = nxt()                # (P, B)
    mu = nxt()                # (1, B)
    e = nxt()                 # (1, B)
    g = nxt()                 # (3, B)
    n = None if flat else nxt()   # (P, 3, B)
    lam_in = nxt() if warm0 else None   # (P, 3, B) cross-step warm seed
    q = nxt()                 # (12, B)
    qd = nxt()                # (12, B)
    pos = nxt()               # (3, B)
    quat = nxt()              # (4, B)
    lin = nxt()               # (3, B)
    ang = nxt()               # (3, B)
    tgt = nxt()               # (D, 12, B) effective targets per substep
    strengths = nxt()         # (12, B)
    if control_type == "P":
        kp = nxt()            # (12, B)
        kd = nxt()
    else:
        W0b = nxt()           # (384, 72)
        b0b = nxt()           # (384, 1)
        W1b = nxt()           # (384, 384)
        b1b = nxt()
        W2b = nxt()           # (12, 384)
        b2b = nxt()           # (12, 1)
        el = nxt()            # (12, B) joint_pos_err_last
        ell = nxt()           # joint_pos_err_last_last
        vl = nxt()            # joint_vel_last
        vll = nxt()           # joint_vel_last_last
    vlim = nxt()              # (nv, 1)
    tlim = nxt()              # (12, 1)
    qlo = nxt()               # (12, 1)
    qhi = nxt()               # (12, 1)
    outs = list(it)

    bt = q.shape[1:]          # trailing batch dims: (B,) or (8, B//8)
    f32 = q.dtype

    if exact:
        pcp = jnp.zeros((P, 3) + bt, f32)  # replaced by fresh FK below
    else:
        # contact cache once per control step, entirely in VMEM; r =
        # contact points about the anchor (= entry base position,
        # envminor.r_t)
        r = pcp - jnp.expand_dims(pos, 0)
        J, W = pc.cache_core(anc_pn, Sw, Sv, Minv, r, eps=eps)

    ref_pt = pos              # cache anchor = entry base position
    pcp_prev = pcp
    lam = jnp.zeros((P, 3) + bt, f32) if lam_in is None else lam_in
    tau_m = jnp.zeros((nj,) + bt, f32)
    zeros6 = jnp.zeros((6,) + bt, f32)
    vlim_j = vlim[6:]         # (12, 1)

    has_hist = control_type != "P"

    def run_substep(tgt_s, q, qd, pos, quat, lin, ang, pcp, pcp_prev,
                    lam, tau_m, hist, warm):
        # -- torque model (go1_env._compute_torques,
        #    reference legged_robot.py:907-946) --
        if control_type == "P":
            tau_m = kp * (tgt_s - q) - kd * qd
        else:
            el, ell, vl, vll = hist
            err = q - tgt_s
            X = jnp.concatenate([err, el, ell, qd, vl, vll], axis=0)

            def _net(X2):
                h = _softsign(jax.lax.dot(
                    W0b, X2, precision=jax.lax.Precision.HIGHEST) + b0b)
                h = _softsign(jax.lax.dot(
                    W1b, h, precision=jax.lax.Precision.HIGHEST) + b1b)
                return jax.lax.dot(
                    W2b, h, precision=jax.lax.Precision.HIGHEST) + b2b

            if X.ndim == 2:
                tau_m = _net(X)
            else:
                # pre-split (8, B/8) batch: MXU dots need 2-D operands —
                # run one (384, 72) x (72, B/8) chain per sublane row
                tau_m = jnp.stack(
                    [_net(X[:, sl]) for sl in range(X.shape[1])], axis=1)
            hist = (err, el, qd, vl)
        tau_m = tau_m * strengths
        tau_m = jnp.clip(tau_m, -tlim, tlim)

        # joint-limit torques (engine.physics_substep_cached:679-685)
        over = jnp.maximum(q - qhi, 0.0)
        under = jnp.maximum(qlo - q, 0.0)
        at_lim = jnp.logical_or(over > 0, under > 0).astype(f32)
        tau_lim = limit_stiffness * (under - over) \
            - limit_damping * at_lim * qd
        tau_full = jnp.concatenate([zeros6, tau_m + tau_lim], axis=0)

        if exact:
            # exact mode: full cache rebuild (FK/CRBA/M^-1/J/W) from the
            # CURRENT state, all in VMEM — the per-substep recomputation
            # semantics of engine.physics_substep with zero extra
            # launches or HBM cache traffic
            Sw_, Sv_, Ab_, Bb_, mb_, Minv_, r_, pcp = _cache_arrays(
                model, q, quat, pos, payload, comdisp)
            J_, W_ = pc.cache_core(anc_pn, Sw_, Sv_, Minv_, r_, eps=eps)
            ref = pos         # re-anchor: delta = 0
        else:
            Sw_, Sv_, Ab_, Bb_, mb_, Minv_ = Sw, Sv, Ab, Bb, mb, Minv
            J_, W_ = J, W
            ref = ref_pt

        # -- unconstrained dynamics at the anchor point --
        delta = ref - pos                                    # (3, B)
        v_ref = lin + _cross3(ang, delta)
        gv = jnp.concatenate([ang, v_ref, qd], axis=0)       # (nv, B)
        # midpoint (RK2) on the velocity-product terms: explicit Euler is
        # unconditionally unstable for the gyroscopic part (imaginary
        # eigenvalues) — zero-torque tumbling gains ~6%/s energy at
        # |w| = 5 rad/s and blows up past ~15; the midpoint evaluation is
        # near-conservative through 40 rad/s (runs/seed2_blowup study)
        qdd1 = pd.dyn_core(Sw_, Sv_, Ab_, Bb_, mb_, Minv_, g, tau_full,
                           gv, anc=anc, joint_body=joint_body,
                           nb=nb, nj=nj, nv=nv)
        gv_mid = gv + (0.5 * dt) * qdd1
        qdd = pd.dyn_core(Sw_, Sv_, Ab_, Bb_, mb_, Minv_, g, tau_full,
                          gv_mid, anc=anc, joint_body=joint_body,
                          nb=nb, nj=nj, nv=nv)
        gv_free = gv + dt * qdd

        # -- contact solve + point advance --
        if contact:
            gv_new, pcp_new, lam = pc.contact_core(
                J_, W_, Minv_, pcp, gv_free, rh, mu, e, vlim,
                num_iters=warm_iters if warm else num_iters,
                relaxation=relaxation, dt=dt,
                baumgarte=baumgarte, slop=slop, max_depen=max_depen,
                bounce_thresh=bounce_thresh, groups=groups, n=n,
                lam0=lam if warm else None)
        else:
            gv_new = gv_free
            pcp_new = pcp
            lam = jnp.zeros((P, 3) + bt, f32)
        pcp_prev = pcp
        pcp = pcp_new

        # -- clips + integration (engine.physics_substep_cached:761-775) --
        qd = jnp.clip(gv_new[6:], -vlim_j, vlim_j)
        ang = jnp.clip(gv_new[0:3], -max_base_ang_vel, max_base_ang_vel)
        v_ref_n = jnp.clip(gv_new[3:6], -max_base_lin_vel, max_base_lin_vel)
        lin = v_ref_n - _cross3(ang, delta)
        pos = pos + dt * lin
        quat = _quat_integrate(quat, ang, dt)
        q = q + dt * qd
        return q, qd, pos, quat, lin, ang, pcp, pcp_prev, lam, tau_m, hist

    hist0 = (el, ell, vl, vll) if has_hist else ()
    if exact:
        # s-independent body (no warm start in exact mode) -> run the
        # substeps as an in-kernel fori_loop: the Mosaic program contains
        # ONE substep (incl. the cache-rebuild chain) instead of D copies
        # — unrolling made the remote compile pathologically slow
        def loop_body(si, carry):
            q, qd, pos, quat, lin, ang, pcp, pcp_prev, lam, tau_m, hist = \
                carry
            # Mosaic has no dynamic_slice: select the substep's target
            # row with a static one-hot sum over the D rows (D is 4)
            tgt_s = jnp.zeros((nj,) + bt, f32)
            for k in range(D):
                sel = (si == k).astype(f32)
                tgt_s = tgt_s + sel * tgt[k]
            return run_substep(tgt_s, q, qd, pos, quat, lin, ang, pcp,
                               pcp_prev, lam, tau_m, hist, warm=False)

        (q, qd, pos, quat, lin, ang, pcp, pcp_prev, lam, tau_m,
         hist0) = jax.lax.fori_loop(
            0, D, loop_body,
            (q, qd, pos, quat, lin, ang, pcp, pcp_prev, lam, tau_m,
             hist0))
    else:
        for si in range(D):
            # warm start: substeps after the first seed the iteration
            # with the previous substep's converged impulses
            # (PhysX-style) and run the shorter warm iteration count;
            # with a cross-step seed (warm0) the first substep
            # warm-starts too
            warm = warm_iters > 0 and (si > 0 or warm0)
            (q, qd, pos, quat, lin, ang, pcp, pcp_prev, lam, tau_m,
             hist0) = run_substep(tgt[si], q, qd, pos, quat, lin, ang,
                                  pcp, pcp_prev, lam, tau_m, hist0,
                                  warm=warm)
    if has_hist:
        el, ell, vl, vll = hist0

    results = [q, qd, pos, quat, lin, ang, pcp, pcp_prev, lam, tau_m]
    if control_type != "P":
        results += [el, ell, vl, vll]
    assert len(results) == len(outs)
    for o, v in zip(outs, results):
        o[:] = v


def _const_spec(shape):
    def idx(i, nd=len(shape)):
        return (0,) * nd

    return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)


def control_step_pallas(em, rh_t, mu_t, e_t, g_t, n_t,
                        q_t, qd_t, pos_t, quat_t, lin_t, ang_t,
                        tgt_t, strengths_t, ctrl_inputs,
                        vlim, tlim, qlo, qhi, lam_in_t=None, *,
                        model, control_type: str,
                        dt: float, num_iters: int, warm_iters: int = 0,
                        relaxation: float,
                        baumgarte: float, slop: float, max_depen: float,
                        bounce_thresh: float, contact: bool,
                        limit_stiffness: float, limit_damping: float,
                        max_base_ang_vel: float, max_base_lin_vel: float,
                        decimation: int,
                        block: int = 256, interpret: bool = False,
                        eps: float = 1e-6,
                        exact_inputs=None):
    """One whole control step (`decimation` physics substeps), env-minor.

    `em` is the physics/envminor.EnvMinorCache for the entry state;
    `tgt_t` (D, 12, Npad) carries per-substep effective joint-position
    targets (target -/+ motor offsets depending on control type, see
    go1_env.step); `ctrl_inputs` is (kp_eff_t, kd_eff_t) for P control or
    (W0b, b0b, W1b, b1b, W2b, b2b, el_t, ell_t, vl_t, vll_t) for the
    actuator network.  `vlim`/`tlim`/`qlo`/`qhi` are (rows, 1) per-dof
    bound columns.

    `exact_inputs`: None for reuse mode (cache from `em`, anchored at the
    entry state), or (payload_t (1, Npad), comdisp_t (3, Npad)) for EXACT
    mode — the kernel rebuilds the whole cache (FK/CRBA/M^-1/J/W) from
    the current state before every substep (flat ground only; `em` is
    ignored and may be None).

    Returns (q, qd, pos, quat, lin, ang, pcp, pcp_prev, lam, tau_last
    [, el, ell, vl, vll]) — all env-minor."""
    nv = model.nv
    nb = model.nb
    nj = nv - 6
    P = model.cp_body.shape[0]
    bt = q_t.shape[1:]    # (Npad,) or, exact mode, (8, Npad // 8)
    Npad = q_t.shape[-1]
    exact = exact_inputs is not None
    grid = (Npad // block,)
    f32 = q_t.dtype

    anc = np.asarray(model.anc_dof_body).astype(bool)
    anc_p = anc[:, np.asarray(model.cp_body)].T             # (P, nv)
    groups = tuple(pc.point_dof_groups(anc_p))
    anc_pn = jnp.asarray(anc_p, dtype=f32)
    if exact:
        # pre-shape the mask for 4-D broadcasting (see cache_core)
        anc_pn = anc_pn[:, :, None, None]
    flat = n_t is None

    if exact:
        assert flat, "exact megastep is flat-ground only"
        payload_t, comdisp_t = exact_inputs
        inputs = [anc_pn, payload_t, comdisp_t, rh_t, mu_t, e_t, g_t]
        specs = [_const_spec((P, nv, 1, 1))]
    else:
        inputs = [anc_pn, em.Sw_t, em.Sv_t, em.A_t, em.B_t, em.m_t,
                  em.Minv_t, em.p_cp_t, rh_t, mu_t, e_t, g_t]
        specs = [_const_spec((P, nv))]
    specs += [_spec(x.shape, block) for x in inputs[1:]]
    if not flat:
        inputs.append(n_t)
        specs.append(_spec(n_t.shape, block))
    warm0 = lam_in_t is not None
    if warm0:
        inputs.append(lam_in_t)
        specs.append(_spec(lam_in_t.shape, block))
    state_in = [q_t, qd_t, pos_t, quat_t, lin_t, ang_t, tgt_t, strengths_t]
    inputs += state_in
    specs += [_spec(x.shape, block) for x in state_in]
    if control_type == "P":
        kp_t, kd_t = ctrl_inputs
        inputs += [kp_t, kd_t]
        specs += [_spec(kp_t.shape, block), _spec(kd_t.shape, block)]
        n_hist = 0
    else:
        W0b, b0b, W1b, b1b, W2b, b2b, el_t, ell_t, vl_t, vll_t = ctrl_inputs
        inputs += [W0b, b0b, W1b, b1b, W2b, b2b]
        specs += [_const_spec(x.shape) for x in (W0b, b0b, W1b, b1b,
                                                 W2b, b2b)]
        inputs += [el_t, ell_t, vl_t, vll_t]
        specs += [_spec(x.shape, block) for x in (el_t, ell_t, vl_t, vll_t)]
        n_hist = 4
    inputs += [vlim, tlim, qlo, qhi]
    specs += [_const_spec(x.shape) for x in (vlim, tlim, qlo, qhi)]

    out_shapes = [(nj,) + bt, (nj,) + bt, (3,) + bt, (4,) + bt,
                  (3,) + bt, (3,) + bt, (P, 3) + bt, (P, 3) + bt,
                  (P, 3) + bt, (nj,) + bt] + [(nj,) + bt] * n_hist
    kernel = functools.partial(
        _megastep_kernel, anc=anc, joint_body=np.asarray(model.joint_body),
        groups=groups, nb=nb, nj=nj, nv=nv, P=P, D=decimation, dt=dt,
        num_iters=num_iters, warm_iters=warm_iters, warm0=warm0,
        relaxation=relaxation, baumgarte=baumgarte,
        slop=slop, max_depen=max_depen, bounce_thresh=bounce_thresh,
        contact=contact, flat=flat, control_type=control_type,
        limit_stiffness=limit_stiffness, limit_damping=limit_damping,
        max_base_ang_vel=max_base_ang_vel,
        max_base_lin_vel=max_base_lin_vel, eps=eps,
        exact=exact, model=model if exact else None)
    compiler_params = None
    if exact:
        # the exact-mode substep body holds the whole in-kernel cache
        # rebuild's temporaries on the scoped-vmem stack; the 16 MB
        # default limit is far below the v5e's 128 MB VMEM — raise it.
        # (An earlier rebuild chain peaked ~107 MB at block=1024; the
        # current one compiles within this limit.  120 MB leaves the
        # compiler headroom for future growth while staying under the
        # 128 MB physical VMEM.)
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=tuple(_spec(s, block) for s in out_shapes),
        out_shape=tuple(jax.ShapeDtypeStruct(s, f32) for s in out_shapes),
        interpret=interpret,
        compiler_params=compiler_params,
    )(*inputs)
