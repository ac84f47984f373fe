"""Pallas TPU kernel for the contact impulse solve.

The projected-Jacobi iteration in physics/engine.py:_contact_solve re-reads
the (N, P, 3, nv) contact Jacobian and (N, P, nv, 3) M^-1 J^T from HBM on
every one of its 16 iterations — ~0.8 GB of HBM traffic per substep at
N=4096.  This kernel runs the whole iteration loop inside VMEM with the env
batch on the lane dimension (env-minor layout): every elementwise op and
reduction is perfectly lane-packed, and J/MinvJT are loaded exactly once.

Layouts (kernel-side, env-minor):
    J        (P3, nv, B)    contact Jacobian rows
    MinvJT   (nv, P3, B)
    Lam      (P, 9, B)      3x3 effective-mass blocks, row-major flattened
    n_srf    (P, 3, B)      contact normals
    target_n (P, B)         normal velocity targets
    mu       (B,)           friction coefficient (broadcast over points)
    active   (P, B)         contact mask
    gv       (nv, B)        generalized velocity (in/out)
    lam_out  (P, 3, B)      impulses (out)

B (env block) = 256 keeps J + MinvJT (double-buffered by the
pipeline) + scratch under the 16 MB VMEM budget.
The grid is (N // B,) over env blocks; each program is independent.

The caller-side wrapper transposes from the engine's (N, ...) layout, pads
N to a multiple of B, and transposes results back; `interpret=True` makes
the kernel runnable (and tested) on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve_kernel(J_ref, MinvJT_ref, Lam_ref, n_ref, tgt_ref, mu_ref,
                  act_ref, gv_ref, gv_out_ref, lam_out_ref, *,
                  num_iters: int, relaxation: float, P: int, nv: int):
    J = J_ref[:]                 # (P3, nv, B)
    MinvJT = MinvJT_ref[:]       # (nv, P3, B)
    Lam = Lam_ref[:]             # (P, 9, B)
    n = n_ref[:]                 # (P, 3, B)
    tgt = tgt_ref[:]             # (P, B)
    mu = mu_ref[:]               # (P, B)
    act = act_ref[:]             # (P, B)
    B = J.shape[-1]

    def body(_, carry):
        lam, gv = carry          # lam (P, 3, B), gv (nv, B)
        # v[p3, b] = sum_k J[p3, k, b] * gv[k, b]
        v = jnp.sum(J * gv[None, :, :], axis=1)            # (P3, B)
        v = v.reshape(P, 3, B)
        # desired delta: normal -> target, tangential -> 0
        dv = tgt[:, None, :] * n - v                       # (P, 3, B)
        # dlam[p, i] = relaxation * sum_j Lam[p, i, j] dv[p, j]
        Lam33 = Lam.reshape(P, 3, 3, B)
        dlam = relaxation * jnp.sum(Lam33 * dv[:, None, :, :], axis=2)
        new_lam = lam + dlam
        ln = jnp.sum(new_lam * n, axis=1)                  # (P, B)
        lt = new_lam - ln[:, None, :] * n
        ln = jnp.maximum(ln, 0.0)
        lt_norm = jnp.sqrt(jnp.sum(lt * lt, axis=1) + 1e-18)
        max_t = mu * ln
        scale = jnp.where(lt_norm > max_t, max_t / lt_norm, 1.0)
        new_lam = ln[:, None, :] * n + lt * scale[:, None, :]
        new_lam = jnp.where(act[:, None, :] > 0, new_lam, 0.0)
        applied = (new_lam - lam).reshape(P * 3, B)        # (P3, B)
        # gv[k] += sum_p3 MinvJT[k, p3] * applied[p3]
        gv = gv + jnp.sum(MinvJT * applied[None, :, :], axis=1)
        return new_lam, gv

    lam0 = jnp.zeros((P, 3, B), J.dtype)
    lam, gv = jax.lax.fori_loop(0, num_iters, body, (lam0, gv_ref[:]))
    gv_out_ref[:] = gv
    lam_out_ref[:] = lam


def prepare_big_operands(J, MinvJT_p, Lam, block: int = 256):
    """Pre-transpose the large per-control-step operands to env-minor layout.
    Call once per dynamics cache build; the per-substep solve then only
    transposes the small arrays."""
    N, P, _, nv = J.shape
    B = min(block, max(N, 8))
    Npad = ((N + B - 1) // B) * B
    pad = Npad - N

    def prep(x, perm, shape):
        x = jnp.transpose(x, perm)
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x.reshape(shape)

    Jt = prep(J.reshape(N, P * 3, nv), (1, 2, 0), (P * 3, nv, Npad))
    Mt = prep(MinvJT_p.transpose(0, 2, 1, 3).reshape(N, nv, P * 3),
              (1, 2, 0), (nv, P * 3, Npad))
    Lt = prep(Lam.reshape(N, P, 9), (1, 2, 0), (P, 9, Npad))
    return (Jt, Mt, Lt, N, P, nv, B)


def contact_solve_pallas_prepped(ops, n_srf, target_n, mu, active, gen_vel,
                                 num_iters: int, relaxation: float,
                                 interpret: bool = False):
    """Solve with pre-transposed big operands (see prepare_big_operands)."""
    Jt, Mt, Lt, N, P, nv, B = ops
    Npad = Jt.shape[-1]
    pad = Npad - N

    def prep(x, perm, shape):
        x = jnp.transpose(x, perm)
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x.reshape(shape)

    nt = prep(n_srf, (1, 2, 0), (P, 3, Npad))
    tt = prep(target_n, (1, 0), (P, Npad))
    mt = prep(mu, (1, 0), (P, Npad))
    at = prep(active.astype(Jt.dtype), (1, 0), (P, Npad))
    gt = prep(gen_vel, (1, 0), (nv, Npad))

    grid = (Npad // B,)

    def spec(shape):
        ndim = len(shape)
        blk = shape[:-1] + (B,)
        idx = lambda i, _nd=ndim: (0,) * (_nd - 1) + (i,)
        return pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)

    kernel = functools.partial(_solve_kernel, num_iters=num_iters,
                               relaxation=relaxation, P=P, nv=nv)
    gv_out, lam_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(Jt.shape), spec(Mt.shape), spec(Lt.shape),
                  spec(nt.shape), spec(tt.shape), spec(mt.shape),
                  spec(at.shape), spec(gt.shape)],
        out_specs=(spec((nv, Npad)), spec((P, 3, Npad))),
        out_shape=(jax.ShapeDtypeStruct((nv, Npad), Jt.dtype),
                   jax.ShapeDtypeStruct((P, 3, Npad), Jt.dtype)),
        interpret=interpret,
    )(Jt, Mt, Lt, nt, tt, mt, at, gt)

    gv_new = jnp.transpose(gv_out, (1, 0))[:N]
    lam = jnp.transpose(lam_out, (2, 0, 1))[:N]
    return gv_new, lam


def contact_solve_pallas(J, MinvJT_p, Lam, n_srf, target_n, mu, active,
                         gen_vel, num_iters: int, relaxation: float,
                         block: int = 256, interpret: bool = False):
    """Drop-in replacement for the engine's PGS loop.

    Args (engine layouts):
        J        (N, P, 3, nv)
        MinvJT_p (N, P, nv, 3)
        Lam      (N, P, 3, 3)
        n_srf    (N, P, 3)
        target_n (N, P)
        mu       (N, P)
        active   (N, P) bool
        gen_vel  (N, nv)
    Returns (gen_vel_new (N, nv), lam (N, P, 3)).
    """
    ops = prepare_big_operands(J, MinvJT_p, Lam, block)
    return contact_solve_pallas_prepped(ops, n_srf, target_n, mu, active,
                                        gen_vel, num_iters, relaxation,
                                        interpret)
