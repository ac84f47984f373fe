"""Contact warm-start correctness.

The solver iterates over the TOTAL impulse lam with
gv(lam) = gv_free + M^-1 J^T lam, so a converged lam is a fixed point:
re-entering the solve warm-started at that lam must leave (lam, gv)
unchanged.  This is the exact invariant the mega-kernel relies on when it
seeds substeps 2..D with the previous substep's impulses
(ops/pallas_megastep.py; PhysX warm-starts its TGS solver the same way —
SURVEY.md §2.1 PhysX settings).

Plus an end-to-end check: a standing robot stepped with warm-started
short iteration counts stays on the cold-start trajectory.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
from walk_these_ways_tpu.go1_config import mob_train_cfg
from walk_these_ways_tpu.ops import pallas_contact as pc


def _synthetic_contact_problem(seed=0, P=4, nv=18, B=8):
    """A physically-shaped random contact problem (SPD M^-1, points near
    the ground, mixed active/inactive gaps)."""
    rng = np.random.RandomState(seed)
    A = rng.randn(nv, nv).astype(np.float32)
    Minv_m = (A @ A.T / nv + np.eye(nv, dtype=np.float32))
    Minv = jnp.asarray(np.repeat(Minv_m[..., None], B, axis=-1))
    J_m = rng.randn(P, 3, nv).astype(np.float32) * 0.5
    J = jnp.asarray(np.repeat(J_m[..., None], B, axis=-1))
    # W = J Minv J^T + eps I per point (contact_core's row-decoupled
    # solver consumes W itself, not its inverse)
    W9 = np.zeros((P, 9, B), np.float32)
    for p in range(P):
        Wp = J_m[p] @ Minv_m @ J_m[p].T + 1e-6 * np.eye(3)
        W9[p] = Wp.reshape(9)[:, None]
    Lam = jnp.asarray(W9)
    p_cp = jnp.asarray(rng.uniform(-0.01, 0.03, (P, 3, B)).astype(np.float32))
    gv0 = jnp.asarray(rng.randn(nv, B).astype(np.float32))
    rh = jnp.full((P, B), 0.02, jnp.float32)
    mu = jnp.full((1, B), 0.8, jnp.float32)
    e = jnp.full((1, B), 0.1, jnp.float32)
    vlim = jnp.full((nv, 1), 100.0, jnp.float32)
    return J, Lam, Minv, p_cp, gv0, rh, mu, e, vlim


def test_contact_core_warmstart_fixed_point():
    """Converged impulses are a fixed point of the warm-started solve."""
    args = _synthetic_contact_problem()
    kw = dict(num_iters=256, relaxation=0.4, dt=0.005, baumgarte=0.2,
              slop=0.002, max_depen=1.0, bounce_thresh=0.5)
    gv_c, pcp_c, lam_c = pc.contact_core(*args, **kw)
    kw_warm = dict(kw, num_iters=8)
    gv_w, pcp_w, lam_w = pc.contact_core(*args, **kw_warm, lam0=lam_c)
    np.testing.assert_allclose(np.asarray(lam_w), np.asarray(lam_c),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv_w), np.asarray(gv_c),
                               rtol=1e-4, atol=1e-5)


def test_contact_core_warmstart_accelerates_convergence():
    """From a converged seed, few warm iterations beat many cold ones."""
    args = _synthetic_contact_problem(seed=1)
    kw = dict(relaxation=0.4, dt=0.005, baumgarte=0.2, slop=0.002,
              max_depen=1.0, bounce_thresh=0.5)
    gv_ref, _, lam_ref = pc.contact_core(*args, num_iters=512, **kw)
    gv_cold, _, _ = pc.contact_core(*args, num_iters=6, **kw)
    gv_warm, _, _ = pc.contact_core(*args, num_iters=6, **kw, lam0=lam_ref)
    err_cold = float(jnp.abs(gv_cold - gv_ref).max())
    err_warm = float(jnp.abs(gv_warm - gv_ref).max())
    assert err_warm < err_cold * 0.1, (err_warm, err_cold)


def _standing_env(warm):
    cfg = mob_train_cfg(num_envs=8)
    cfg = dataclasses.replace(cfg, sim=dataclasses.replace(
        cfg.sim, contact_warm_start=warm, num_contact_iters_warm=6))
    return LeggedRobotEnv(cfg)


def test_megastep_warmstart_standing_trajectory():
    """5 zero-action control steps from reset: warm 16+3x6 stays within
    millimetres of the cold-16 trajectory (settling contact — the regime
    warm-start is built for)."""
    env_c = _standing_env(False)
    env_w = _standing_env(True)
    sc, _ = env_c.reset(jax.random.PRNGKey(0))
    sw, _ = env_w.reset(jax.random.PRNGKey(0))
    acts = jnp.zeros((8, 12))
    step_c = jax.jit(env_c.step)
    step_w = jax.jit(env_w.step)
    for _ in range(5):
        sc, *_ = step_c(sc, acts)
        sw, *_ = step_w(sw, acts)
    np.testing.assert_allclose(np.asarray(sw.phys.base_pos),
                               np.asarray(sc.phys.base_pos), atol=1e-2)
    # reset adds random joint offsets + base velocities, so the first
    # steps include settle impacts whose outcomes are chaos-sensitive;
    # 0.1 rad catches a broken solver while tolerating impact jitter
    np.testing.assert_allclose(np.asarray(sw.phys.q),
                               np.asarray(sc.phys.q), atol=1e-1)
