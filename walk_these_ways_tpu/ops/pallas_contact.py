"""Pallas TPU kernels for the whole contact pipeline, env-minor layout.

Round-2 profiling showed the contact pipeline dominating the train
iteration NOT through FLOPs but through layout: XLA keeps the
(N, P, 3, nv) Jacobian tensors N-major, so their size-3/size-18 minor dims
tile onto the 128-lane axis with up to 42x padding — every cache-build
einsum and every one of the 16 solver iterations pays that HBM tax, plus
layout copies between einsums (measured ~108 ms of a 350 ms iteration at
N=4000).

These kernels put the env batch on the lane axis (env-minor `(..., N)`
layout) so every tensor is perfectly lane-packed, and run the whole
pipeline in VMEM:

- `contact_cache_kernel` (once per control step): builds the point
  Jacobians J[p,i,v] = anc[p,v] * (Sv[v,i] + Sw[v] x r[p]) and the 3x3
  effective-mass matrices W_p = J_p M^-1 J_p^T + eps I from the
  twist bases and M^-1 of the dynamics cache
  (physics/engine.py:build_dynamics_cache).
- `contact_substep_kernel` (once per physics substep): computes contact
  gaps from the carried contact-point estimate (flat ground: phi =
  radius - z + h0), velocity targets (restitution bounce + capped
  Baumgarte bias, engine.py:_contact_solve), runs `num_iters` row-
  decoupled projected-Jacobi iterations (normal row to target, friction
  row opposite the slip direction, cone clamp at mu * lambda_n)
  specialized to the n = +z normal, applies impulses lazily as
  M^-1 (J^T dlam) (no MinvJT buffer), and advances the contact points
  p' = p + dt * J gv_new.

The flat-ground specialization matches the MoB train config (terrain
mesh_type='boxes' tiles are all flat => engine.flat_terrain() fast path);
heightfield configs fall back to the XLA solver in physics/engine.py.

All kernels are exact reformulations of the XLA path (same math, same
iteration count) — parity-tested in tests/test_pallas_contact.py against
physics/engine.py on CPU (interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# -- env-minor transpose helpers --------------------------------------------


def to_env_minor(x, block: int):
    """(N, ...) -> (..., Npad) with N padded to a multiple of `block`."""
    N = x.shape[0]
    Npad = ((N + block - 1) // block) * block
    perm = tuple(range(1, x.ndim)) + (0,)
    x = jnp.transpose(x, perm)
    if Npad != N:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Npad - N)])
    return x


def from_env_minor(x, N: int):
    """(..., Npad) -> (N, ...)."""
    perm = (x.ndim - 1,) + tuple(range(x.ndim - 1))
    return jnp.transpose(x, perm)[:N]


def _spec(shape, block):
    """BlockSpec tiling only the minor (env) axis."""
    blk = shape[:-1] + (block,)

    def idx(i, nd=len(shape)):
        return (0,) * (nd - 1) + (i,)

    return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)


# -- cache kernel: J and W --------------------------------------------------


def cache_core(anc, Sw, Sv, Minv, r, *, eps: float):
    """In-kernel J/W build on env-minor VMEM values: point Jacobians
    J[p, i, v] = anc[p, v] * (Sv[v, i] + Sw[v] x r[p]) and 3x3
    effective-mass matrices W_p = J_p M^-1 J_p^T + eps I.  Shared by
    the standalone cache kernel below and the whole-control-step kernel
    (ops/pallas_megastep.py).  Returns (J (P, 3, nv, B), W9 (P, 9, B))."""
    P = r.shape[0]
    nv = Sw.shape[0]

    # J[p, i, v, b] = anc[p, v] * (Sv[v, i, b] + (Sw[v] x r[p])[i, b])
    # NOTE basic slices only, expand_dims after — mixing None with integer
    # indices takes jnp's advanced-indexing path, which emits a >2D gather
    # Mosaic cannot lower
    sw0, sw1, sw2 = Sw[:, 0, :], Sw[:, 1, :], Sw[:, 2, :]     # (nv, B)
    sv0, sv1, sv2 = Sv[:, 0, :], Sv[:, 1, :], Sv[:, 2, :]
    r0, r1, r2 = r[:, 0, :], r[:, 1, :], r[:, 2, :]           # (P, B)
    cx = sw1[None] * r2[:, None] - sw2[None] * r1[:, None]    # (P, nv, B)
    cy = sw2[None] * r0[:, None] - sw0[None] * r2[:, None]
    cz = sw0[None] * r1[:, None] - sw1[None] * r0[:, None]
    # (P, nv) mask broadcast over the batch dims; Mosaic cannot cast
    # trailing singleton dims in-kernel, so the exact mega-kernel passes
    # anc pre-shaped (P, nv, 1, 1) from the host
    m = anc[:, :, None] if anc.ndim == 2 else anc
    Jx = m * (sv0[None] + cx)
    Jy = m * (sv1[None] + cy)
    Jz = m * (sv2[None] + cz)
    J = jnp.stack([Jx, Jy, Jz], axis=1)                  # (P, 3, nv, B)

    # W[p, i, j] = sum_vw J[p, i, w] Minv[w, v] J[p, j, v]; build one
    # t_i = J_i M^-1 (P, nv, B) row at a time to keep the live VMEM temp
    # at (P, nv, B) instead of (P, 3, nv, B) (the mega-kernel runs within
    # ~300 KB of the 16 MB scoped-vmem limit at block=256)
    W = [[None] * 3 for _ in range(3)]
    bt = Sw.shape[2:]        # trailing batch dims: (B,) or (8, B//8)
    for i in range(3):
        t_i = jnp.zeros((P, nv) + bt, J.dtype)
        for w in range(nv):
            t_i += J[:, i, w, :][:, None, :] * Minv[w][None, :, :]
        for jc in range(3):
            W[i][jc] = jnp.sum(J[:, jc] * t_i, axis=1)       # (P, B)
    # The row-decoupled solver (contact_core) consumes W itself, not its
    # inverse: per-row scalar effective masses n^T W n / t^T W t.  eps on
    # the diagonal keeps them bounded away from zero.
    W9 = jnp.stack(
        [W[0][0] + eps, W[0][1], W[0][2],
         W[1][0], W[1][1] + eps, W[1][2],
         W[2][0], W[2][1], W[2][2] + eps], axis=1)            # (P, 9, B)
    return J, W9


def _cache_kernel(anc_ref, sw_ref, sv_ref, minv_ref, r_ref,
                  j_ref, w_ref, *, P: int, nv: int, eps: float):
    J, W9 = cache_core(anc_ref[:], sw_ref[:], sv_ref[:], minv_ref[:],
                       r_ref[:], eps=eps)
    j_ref[:] = J
    w_ref[:] = W9


def build_contact_cache_pallas(anc, Sw_t, Sv_t, Minv_t, r_t,
                               block: int = 256, eps: float = 1e-6,
                               interpret: bool = False):
    """anc (P, nv) static mask; Sw_t/Sv_t (nv, 3, Npad); Minv_t
    (nv, nv, Npad); r_t (P, 3, Npad). Returns J_t (P, 3, nv, Npad),
    W_t (P, 9, Npad)."""
    nv = Sw_t.shape[0]
    P = r_t.shape[0]
    Npad = Sw_t.shape[-1]
    grid = (Npad // block,)
    anc_spec = pl.BlockSpec((P, nv), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_cache_kernel, P=P, nv=nv, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[anc_spec, _spec(Sw_t.shape, block), _spec(Sv_t.shape, block),
                  _spec(Minv_t.shape, block), _spec(r_t.shape, block)],
        out_specs=(_spec((P, 3, nv, Npad), block),
                   _spec((P, 9, Npad), block)),
        out_shape=(jax.ShapeDtypeStruct((P, 3, nv, Npad), Sw_t.dtype),
                   jax.ShapeDtypeStruct((P, 9, Npad), Sw_t.dtype)),
        interpret=interpret,
    )(anc, Sw_t, Sv_t, Minv_t, r_t)


# -- substep kernel: targets + projected Jacobi + point advance -------------


def point_dof_groups(anc_p):
    """Static point->dof coupling structure from the (P, nv) ancestor mask:
    contiguous point runs touching only the base dofs [0, 6) plus at most
    one contiguous joint range.  On a quadruped: 8 trunk points (base
    only) + 4 legs x 5 points (base + that leg's 3 dofs) — so the dense
    (P, 3, nv) contractions in the solver loop carry ~2.2x static zeros.
    Returns [(p_lo, p_hi, dof_lo, dof_hi)] with dof_lo=None for
    base-only runs."""
    anc_p = np.asarray(anc_p).astype(bool)
    P, nv = anc_p.shape
    groups = []
    s = 0
    for p in range(1, P + 1):
        if p == P or (anc_p[p] != anc_p[s]).any():
            joint = np.nonzero(anc_p[s][6:])[0]
            if joint.size == 0:
                groups.append((s, p, None, None))
            else:
                lo, hi = 6 + int(joint[0]), 6 + int(joint[-1]) + 1
                assert (anc_p[s][lo:hi]).all(), "non-contiguous dof range"
                groups.append((s, p, lo, hi))
            s = p
    # merge same-joint-range neighbors (thigh [lo,lo+2) + calf [lo,lo+3)
    # runs of one leg) into one run over the union range — zeros inside the
    # union are still skipped relative to the dense (P, nv) contraction
    merged = [groups[0]]
    for (s, p, lo, hi) in groups[1:]:
        ms, mp, mlo, mhi = merged[-1]
        if lo is not None and mlo is not None and \
                max(lo, mlo) < min(hi, mhi):
            merged[-1] = (ms, p, min(lo, mlo), max(hi, mhi))
        else:
            merged.append((s, p, lo, hi))
    return merged


def contact_core(J, W, Minv, p_cp, gv0, rh, mu, e, vlim, *,
                 num_iters: int, relaxation: float, dt: float,
                 baumgarte: float, slop: float, max_depen: float,
                 bounce_thresh: float, groups=None, n=None, lam0=None):
    """Shared in-kernel contact pipeline (gaps -> targets -> projected
    Jacobi -> point advance) on env-minor VMEM values.  Called from the
    contact-only substep kernel below and from the full dynamics substep
    kernel (ops/pallas_dynamics.py).  `W` is the (P, 9, B) per-point
    effective-mass matrix J M^-1 J^T (+eps I), consumed row-decoupled:
    the normal row solves (target - vn) / (n^T W n) and the friction row
    pushes opposite the slip direction t with scalar mass t^T W t,
    clamped to the mu * lambda_n cone.  Decoupling the rows is what PGS
    solvers (PhysX/Bullet/MuJoCo) do; a coupled 3x3 block solve against
    the unreachable target "slip -> 0" biases the projected fixed point
    ~12% inside the friction cone and leaves mm-scale penetration
    (measured in runs/mujoco_parity — the incline mu_eff study).
    `groups` is the static point_dof_groups structure; when given, the J
    contractions in the solver loop skip the statically-zero (point, dof)
    blocks.  `n` is the per-point surface normal (P, 3, B) for
    heightfield terrain; None means flat ground (n = +z), which drops the
    normal-decomposition arithmetic entirely (mirrors
    engine._impulse_iteration general-normal math vs the flat
    specialization).  `lam0` warm-starts the iteration: the solver
    iterates over the TOTAL impulse lam with gv(lam) = gv0 + M^-1 J^T lam,
    so a nonzero initial lam both seeds the iterate and pre-applies its
    impulse to the velocity (PhysX-style warm start — the targets/bounce
    terms still come from the un-warmed free velocity gv0).
    Returns (gv_new, p_cp_new, lam)."""
    P = p_cp.shape[0]
    nv = gv0.shape[0]
    bt = gv0.shape[1:]       # trailing batch dims: (B,) or (8, B//8)

    if groups is None:
        def jdot(gv):
            """(P, 3, B) contact point velocities."""
            return jnp.sum(J * gv[None, None, :, :], axis=2)

        def jt_apply(applied):
            """(nv, B) generalized impulse J^T applied."""
            return jnp.sum(J * applied[:, :, None, :], axis=(0, 1))
    else:
        # NOTE slice-then-expand_dims everywhere: a nonzero-start slice
        # combined with None indexing takes jnp's advanced path and emits
        # a gather Mosaic cannot lower
        def jdot(gv):
            outs = []
            for (s, p, lo, hi) in groups:
                t = jnp.sum(J[s:p, :, 0:6, :] * gv[0:6][None, None],
                            axis=2)
                if lo is not None:
                    t = t + jnp.sum(J[s:p, :, lo:hi, :]
                                    * gv[lo:hi][None, None], axis=2)
                outs.append(t)
            return jnp.concatenate(outs, axis=0)

        def jt_apply(applied):
            base = jnp.sum(J[:, :, 0:6, :] * applied[:, :, None, :],
                           axis=(0, 1))                       # (6, B)
            parts = [base]
            pos = 6
            for (s, p, lo, hi) in groups:
                if lo is None:
                    continue
                assert lo == pos, "joint ranges must tile [6, nv)"
                parts.append(jnp.sum(J[s:p, :, lo:hi, :]
                                     * applied[s:p][:, :, None, :],
                                     axis=(0, 1)))
                pos = hi
            assert pos == nv
            return jnp.concatenate(parts, axis=0)

    # gaps and velocity targets (vertical gap phi = (radius + h) - p_z,
    # engine._contact_solve:445-447)
    phi = rh - p_cp[:, 2, :]                               # (P, B)
    active = (phi > 0.0).astype(J.dtype)
    v0 = jdot(gv0)
    if n is None:
        vn0 = v0[:, 2, :]
    else:
        vn0 = n[:, 0] * v0[:, 0] + n[:, 1] * v0[:, 1] + n[:, 2] * v0[:, 2]
    bounce = jnp.where(vn0 < -bounce_thresh, -e * vn0, 0.0)
    bias = jnp.minimum(baumgarte / dt * jnp.maximum(phi - slop, 0.0),
                       max_depen)
    target = jnp.maximum(bounce, bias)                     # (P, B)

    # loop-invariant scalar effective mass of the normal row
    # (W has +eps on the diagonal, so w_nn >= eps > 0)
    if n is None:
        w_nn = W[:, 8]                                     # n = +z: W22
    else:
        w_nn = (n[:, 0] * (W[:, 0] * n[:, 0] + W[:, 1] * n[:, 1]
                           + W[:, 2] * n[:, 2])
                + n[:, 1] * (W[:, 3] * n[:, 0] + W[:, 4] * n[:, 1]
                             + W[:, 5] * n[:, 2])
                + n[:, 2] * (W[:, 6] * n[:, 0] + W[:, 7] * n[:, 1]
                             + W[:, 8] * n[:, 2]))
    inv_w_nn = relaxation / w_nn

    def body(_, carry):
        lam, gv = carry                                    # (P,3,B), (nv,B)
        v = jdot(gv)
        if n is None:
            vn = v[:, 2, :]
            vtx, vty = v[:, 0, :], v[:, 1, :]
            vtn = jnp.sqrt(vtx * vtx + vty * vty + 1e-18)
            itn = 1.0 / vtn
            tx, ty = vtx * itn, vty * itn
            # slip-direction scalar effective mass t^T W t (tz = 0)
            # vt = 0 exactly makes t the zero vector: floor w_tt at eps
            w_tt = jnp.maximum(tx * tx * W[:, 0] + 2.0 * tx * ty * W[:, 1]
                               + ty * ty * W[:, 4], 1e-6)
            dln = (target - vn) * inv_w_nn
            dlt = -relaxation * vtn / w_tt
            ln = jnp.maximum(lam[:, 2, :] + dln, 0.0)
            lx = lam[:, 0, :] + dlt * tx
            ly = lam[:, 1, :] + dlt * ty
            ltn = jnp.sqrt(lx * lx + ly * ly + 1e-18)
            max_t = mu * ln
            scale = jnp.where(ltn > max_t, max_t / ltn, 1.0)
            lx = lx * scale * active
            ly = ly * scale * active
            lz = ln * active
        else:
            vn = n[:, 0] * v[:, 0] + n[:, 1] * v[:, 1] + n[:, 2] * v[:, 2]
            vtx = v[:, 0, :] - vn * n[:, 0]
            vty = v[:, 1, :] - vn * n[:, 1]
            vtz = v[:, 2, :] - vn * n[:, 2]
            vtn = jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz + 1e-18)
            itn = 1.0 / vtn
            tx, ty, tz = vtx * itn, vty * itn, vtz * itn
            w_tt = jnp.maximum(
                tx * (W[:, 0] * tx + W[:, 1] * ty + W[:, 2] * tz)
                + ty * (W[:, 3] * tx + W[:, 4] * ty + W[:, 5] * tz)
                + tz * (W[:, 6] * tx + W[:, 7] * ty + W[:, 8] * tz), 1e-6)
            dln = (target - vn) * inv_w_nn
            dlt = -relaxation * vtn / w_tt
            l_n0 = (lam[:, 0, :] * n[:, 0] + lam[:, 1, :] * n[:, 1]
                    + lam[:, 2, :] * n[:, 2])
            ln = jnp.maximum(l_n0 + dln, 0.0)
            lx = lam[:, 0, :] - l_n0 * n[:, 0] + dlt * tx
            ly = lam[:, 1, :] - l_n0 * n[:, 1] + dlt * ty
            lz = lam[:, 2, :] - l_n0 * n[:, 2] + dlt * tz
            ltn = jnp.sqrt(lx * lx + ly * ly + lz * lz + 1e-18)
            max_t = mu * ln
            scale = jnp.where(ltn > max_t, max_t / ltn, 1.0)
            lx = (ln * n[:, 0] + lx * scale) * active
            ly = (ln * n[:, 1] + ly * scale) * active
            lz = (ln * n[:, 2] + lz * scale) * active
        new_lam = jnp.stack([lx, ly, lz], axis=1)          # (P, 3, B)
        applied = new_lam - lam
        # lazy impulse apply: gv += M^-1 (J^T applied)
        jta = jt_apply(applied)                                  # (nv, B)
        dgv = jnp.sum(Minv * jta[None, :, :], axis=1)            # (nv, B)
        return new_lam, gv + dgv

    if lam0 is None:
        lam_init, gv_init = jnp.zeros((P, 3) + bt, J.dtype), gv0
    else:
        jta = jt_apply(lam0)
        lam_init = lam0
        gv_init = gv0 + jnp.sum(Minv * jta[None, :, :], axis=1)
    lam, gv = jax.lax.fori_loop(0, num_iters, body, (lam_init, gv_init))
    # advance with the clamped velocities the integrator will apply
    # (engine.py clamps qd to the URDF limits and the base to its caps)
    gv_cl = jnp.clip(gv, -vlim, vlim)
    return gv, p_cp + dt * jdot(gv_cl), lam


def _substep_kernel(j_ref, w_ref, minv_ref, pcp_ref, gv_ref, rh_ref,
                    mu_ref, e_ref, vlim_ref,
                    gv_out_ref, pcp_out_ref, lam_out_ref, *,
                    P: int, nv: int, num_iters: int, relaxation: float,
                    dt: float, baumgarte: float, slop: float,
                    max_depen: float, bounce_thresh: float):
    gv, pcp, lam = contact_core(
        j_ref[:], w_ref[:], minv_ref[:], pcp_ref[:], gv_ref[:],
        rh_ref[:], mu_ref[:], e_ref[:], vlim_ref[:],
        num_iters=num_iters, relaxation=relaxation, dt=dt,
        baumgarte=baumgarte, slop=slop, max_depen=max_depen,
        bounce_thresh=bounce_thresh)
    gv_out_ref[:] = gv
    pcp_out_ref[:] = pcp
    lam_out_ref[:] = lam


def contact_substep_pallas(J_t, W_t, Minv_t, pcp_t, gv_t, rh_t, mu_t, e_t,
                           vlim, *, num_iters: int, relaxation: float,
                           dt: float, baumgarte: float, slop: float,
                           max_depen: float, bounce_thresh: float,
                           block: int = 256, interpret: bool = False):
    """One contact substep, everything env-minor.  `vlim` (nv, 1) holds the
    per-row velocity bounds used for the point advance.

    Returns (gv_new_t (nv, Npad), pcp_new_t (P, 3, Npad),
    lam_t (P, 3, Npad))."""
    P = pcp_t.shape[0]
    nv = gv_t.shape[0]
    Npad = gv_t.shape[-1]
    grid = (Npad // block,)
    vlim_spec = pl.BlockSpec((nv, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _substep_kernel, P=P, nv=nv, num_iters=num_iters,
        relaxation=relaxation, dt=dt, baumgarte=baumgarte, slop=slop,
        max_depen=max_depen, bounce_thresh=bounce_thresh)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_spec(J_t.shape, block), _spec(W_t.shape, block),
                  _spec(Minv_t.shape, block), _spec(pcp_t.shape, block),
                  _spec(gv_t.shape, block), _spec(rh_t.shape, block),
                  _spec(mu_t.shape, block), _spec(e_t.shape, block),
                  vlim_spec],
        out_specs=(_spec((nv, Npad), block), _spec((P, 3, Npad), block),
                   _spec((P, 3, Npad), block)),
        out_shape=(jax.ShapeDtypeStruct((nv, Npad), gv_t.dtype),
                   jax.ShapeDtypeStruct((P, 3, Npad), gv_t.dtype),
                   jax.ShapeDtypeStruct((P, 3, Npad), gv_t.dtype)),
        interpret=interpret,
    )(J_t, W_t, Minv_t, pcp_t, gv_t, rh_t, mu_t, e_t, vlim)
