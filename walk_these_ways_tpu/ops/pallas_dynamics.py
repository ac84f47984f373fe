"""Pallas TPU kernel for the FULL cached physics substep, env-minor.

Extends the contact substep kernel (ops/pallas_contact.py) upstream: the
per-substep rigid-body dynamics that engine.physics_substep_cached ran in
XLA — body twists, RNEA bias forces (Coriolis + gravity), unconstrained
acceleration qdd = M^-1 (tau - bias), and the centripetal reference-point
correction — move into the same VMEM-resident kernel, so ONE kernel call
per substep covers velocity update + contact solve + point advance.

Why: those XLA ops consume the cache's (N, nv, 3) twist bases and
(N, nb, 3, 3) inertia blocks in N-major layout, whose size-3 minor dims
tile onto the 128-lane axis at ~2-37% occupancy (round-2 profile).  Here
every operand is env-minor (full lanes), the robot's static topology
(ancestor masks, joint->body map) is unrolled at trace time into the
kernel body — including the sparsity of the masks — and no intermediate
ever touches HBM.

Math matches engine.body_twists / engine.bias_forces /
engine.physics_substep_cached:631-655 exactly (same operation order per
term; parity-tested in tests/test_pallas_dynamics.py).  Reference
semantics trace to the reference's PhysX step (SURVEY.md §2.1) via the
XLA path's per-feature citations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_contact as pc
from .pallas_contact import _spec, contact_core


def _cross(a, b):
    """(3, B) x (3, B) -> (3, B) via row slices (no gathers)."""
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]], axis=0)


def _m3_vec(M9, v):
    """M9 (9, B) row-major 3x3 blocks, v (3, B) -> (3, B)."""
    return jnp.stack([
        M9[0] * v[0] + M9[1] * v[1] + M9[2] * v[2],
        M9[3] * v[0] + M9[4] * v[1] + M9[5] * v[2],
        M9[6] * v[0] + M9[7] * v[1] + M9[8] * v[2]], axis=0)


def _m3T_vec(M9, v):
    return jnp.stack([
        M9[0] * v[0] + M9[3] * v[1] + M9[6] * v[2],
        M9[1] * v[0] + M9[4] * v[1] + M9[7] * v[2],
        M9[2] * v[0] + M9[5] * v[1] + M9[8] * v[2]], axis=0)


def dyn_core(Sw, Sv, Ab, Bb, mb, Minv, g, tau, gv, *,
             anc: np.ndarray, joint_body: np.ndarray,
             nb: int, nj: int, nv: int):
    """In-kernel unconstrained dynamics on env-minor VMEM values: body
    twists, RNEA bias forces, qdd = M^-1 (tau - bias) plus the centripetal
    reference-point correction.  Shared by the substep kernel below and the
    whole-control-step kernel (ops/pallas_megastep.py).  Returns qdd
    (nv, B)."""
    # body twists: Vw[b] = sum_{d: anc[d,b]} Sw[d] * gv[d]
    # (engine.body_twists; the ancestor mask is static -> only the <=9
    # nonzero terms per body are emitted)
    Vw, Vv = [], []
    for b in range(nb):
        dofs = [d for d in range(nv) if anc[d, b]]
        w = Sw[dofs[0]] * gv[dofs[0]]
        v = Sv[dofs[0]] * gv[dofs[0]]
        for d in dofs[1:]:
            w = w + Sw[d] * gv[d]
            v = v + Sv[d] * gv[d]
        Vw.append(w)
        Vv.append(v)

    # per-joint velocity-product terms (engine.bias_forces:336-339)
    Cw, Cv = [None] * nj, [None] * nj
    for j in range(nj):
        jb = int(joint_body[j])
        qd = gv[6 + j]
        Cw[j] = _cross(Vw[jb], Sw[6 + j]) * qd
        Cv[j] = (_cross(Vw[jb], Sv[6 + j]) + _cross(Vv[jb], Sw[6 + j])) * qd

    # bias accelerations per body: aw[b] = sum_{j anc of b} Cw[j],
    # av[b] = -g + sum Cv[j]
    Fw_sum = None
    Fv_sum = None
    Fw, Fv = [], []
    for b in range(nb):
        joints = [j for j in range(nj) if anc[6 + j, b]]
        aw = jnp.zeros_like(g)
        av = -g
        for j in joints:
            aw = aw + Cw[j]
            av = av + Cv[j]
        # F = I a + V x (I V)  in block form (engine.bias_forces:344-353)
        IVw = _m3_vec(Ab[b], Vw[b]) + _m3_vec(Bb[b], Vv[b])
        IVv = _m3T_vec(Bb[b], Vw[b]) + mb[b] * Vv[b]
        IAw = _m3_vec(Ab[b], aw) + _m3_vec(Bb[b], av)
        IAv = _m3T_vec(Bb[b], aw) + mb[b] * av
        fw = IAw + _cross(Vw[b], IVw) + _cross(Vv[b], IVv)
        fv = IAv + _cross(Vw[b], IVv)
        Fw.append(fw)
        Fv.append(fv)
        Fw_sum = fw if Fw_sum is None else Fw_sum + fw
        Fv_sum = fv if Fv_sum is None else Fv_sum + fv

    # project onto the twist rows: bias[d] = sum_b anc[d,b]
    # (Sw[d].Fw_b + Sv[d].Fv_b); root rows are unit vectors
    rows = [Fw_sum[0], Fw_sum[1], Fw_sum[2],
            Fv_sum[0], Fv_sum[1], Fv_sum[2]]
    for j in range(nj):
        bodies = [b for b in range(nb) if anc[6 + j, b]]
        acc = None
        for b in bodies:
            t = (Sw[6 + j, 0] * Fw[b][0] + Sw[6 + j, 1] * Fw[b][1]
                 + Sw[6 + j, 2] * Fw[b][2]
                 + Sv[6 + j, 0] * Fv[b][0] + Sv[6 + j, 1] * Fv[b][1]
                 + Sv[6 + j, 2] * Fv[b][2])
            acc = t if acc is None else acc + t
        rows.append(acc)
    bias = jnp.stack(rows, axis=0)                          # (nv, B)

    # qdd = M^-1 (tau - bias) + centripetal correction on the linear rows
    # (engine.physics_substep_cached:653-655)
    tb = tau - bias
    qdd = jnp.sum(Minv * tb[None, :, :], axis=1)            # (nv, B)
    corr = _cross(gv[0:3], gv[3:6])                         # (3, B)
    # (no .at[].add — Mosaic has no scatter; static-slice concat instead)
    return jnp.concatenate([qdd[0:3], qdd[3:6] + corr, qdd[6:]], axis=0)


def _dyn_substep_kernel(sw_ref, sv_ref, a_ref, b_ref, m_ref, minv_ref,
                        g_ref, tau_ref, gv_ref,
                        j_ref, w_ref, pcp_ref, rh_ref, mu_ref, e_ref,
                        vlim_ref, *rest,
                        anc: np.ndarray, joint_body: np.ndarray,
                        groups: tuple, nb: int, nj: int, nv: int,
                        dt: float, num_iters: int, relaxation: float,
                        baumgarte: float, slop: float, max_depen: float,
                        bounce_thresh: float, contact: bool, flat: bool):
    if flat:
        n_ref = None
        gv_out_ref, pcp_out_ref, lam_out_ref = rest
    else:
        n_ref, gv_out_ref, pcp_out_ref, lam_out_ref = rest
    Minv = minv_ref[:]      # (nv, nv, B)
    gv = gv_ref[:]          # (nv, B)
    # midpoint (RK2) on the velocity-product terms — see
    # ops/pallas_megastep.py for the stability rationale
    qdd1 = dyn_core(sw_ref[:], sv_ref[:], a_ref[:], b_ref[:], m_ref[:],
                    Minv, g_ref[:], tau_ref[:], gv,
                    anc=anc, joint_body=joint_body, nb=nb, nj=nj, nv=nv)
    gv_mid = gv + (0.5 * dt) * qdd1
    qdd = dyn_core(sw_ref[:], sv_ref[:], a_ref[:], b_ref[:], m_ref[:],
                   Minv, g_ref[:], tau_ref[:], gv_mid,
                   anc=anc, joint_body=joint_body, nb=nb, nj=nj, nv=nv)
    gv_free = gv + dt * qdd

    if contact:
        gv_new, pcp_new, lam = contact_core(
            j_ref[:], w_ref[:], Minv, pcp_ref[:], gv_free,
            rh_ref[:], mu_ref[:], e_ref[:], vlim_ref[:],
            num_iters=num_iters, relaxation=relaxation, dt=dt,
            baumgarte=baumgarte, slop=slop, max_depen=max_depen,
            bounce_thresh=bounce_thresh, groups=groups,
            n=None if flat else n_ref[:])
    else:
        gv_new = gv_free
        pcp_new = pcp_ref[:]
        lam = jnp.zeros_like(pcp_new)
    gv_out_ref[:] = gv_new
    pcp_out_ref[:] = pcp_new
    lam_out_ref[:] = lam


def dynamics_substep_pallas(Sw_t, Sv_t, A_t, B_t, m_t, Minv_t, g_t, tau_t,
                            gv_t, J_t, W_t, pcp_t, rh_t, mu_t, e_t, vlim,
                            n_t=None,
                            *, anc: np.ndarray, joint_body: np.ndarray,
                            cp_body: np.ndarray,
                            dt: float, num_iters: int, relaxation: float,
                            baumgarte: float, slop: float, max_depen: float,
                            bounce_thresh: float, contact: bool = True,
                            block: int = 256, interpret: bool = False):
    """One full cached physics substep (twists + bias + qdd + contact +
    point advance), env-minor.  `n_t` (P, 3, Npad) carries per-point
    surface normals for heightfield terrain (None = flat, n = +z).
    Returns (gv_new_t (nv, Npad), pcp_new_t (P, 3, Npad),
    lam_t (P, 3, Npad))."""
    nv = gv_t.shape[0]
    nb = m_t.shape[0]
    nj = nv - 6
    P = pcp_t.shape[0]
    Npad = gv_t.shape[-1]
    grid = (Npad // block,)
    vlim_spec = pl.BlockSpec((nv, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    anc = np.asarray(anc).astype(bool)
    anc_p = anc[:, np.asarray(cp_body)].T                 # (P, nv)
    groups = tuple(pc.point_dof_groups(anc_p))
    flat = n_t is None
    kernel = functools.partial(
        _dyn_substep_kernel, anc=anc,
        joint_body=np.asarray(joint_body), groups=groups,
        nb=nb, nj=nj, nv=nv, dt=dt,
        num_iters=num_iters, relaxation=relaxation, baumgarte=baumgarte,
        slop=slop, max_depen=max_depen, bounce_thresh=bounce_thresh,
        contact=contact, flat=flat)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_spec(Sw_t.shape, block), _spec(Sv_t.shape, block),
                  _spec(A_t.shape, block), _spec(B_t.shape, block),
                  _spec(m_t.shape, block), _spec(Minv_t.shape, block),
                  _spec(g_t.shape, block), _spec(tau_t.shape, block),
                  _spec(gv_t.shape, block),
                  _spec(J_t.shape, block), _spec(W_t.shape, block),
                  _spec(pcp_t.shape, block), _spec(rh_t.shape, block),
                  _spec(mu_t.shape, block), _spec(e_t.shape, block),
                  vlim_spec]
                 + ([] if flat else [_spec(n_t.shape, block)]),
        out_specs=(_spec((nv, Npad), block), _spec((P, 3, Npad), block),
                   _spec((P, 3, Npad), block)),
        out_shape=(jax.ShapeDtypeStruct((nv, Npad), gv_t.dtype),
                   jax.ShapeDtypeStruct((P, 3, Npad), gv_t.dtype),
                   jax.ShapeDtypeStruct((P, 3, Npad), gv_t.dtype)),
        interpret=interpret,
    )(*((Sw_t, Sv_t, A_t, B_t, m_t, Minv_t, g_t, tau_t, gv_t,
         J_t, W_t, pcp_t, rh_t, mu_t, e_t, vlim)
        + (() if flat else (n_t,))))
