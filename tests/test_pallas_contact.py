"""Pallas contact kernel vs the XLA reference loop (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.ops.pallas_contact import contact_solve_pallas


def _xla_reference(J, MinvJT_p, Lam, n_srf, target_n, mu, active, gen_vel,
                   num_iters, relaxation):
    N, P, _, nv = J.shape
    lam = jnp.zeros((N, P, 3))

    def iter_body(_, carry):
        lam, gv = carry
        v = jnp.einsum("npiv,nv->npi", J, gv)
        dv_des = target_n[..., None] * n_srf - v
        dlam = relaxation * jnp.einsum("npij,npj->npi", Lam, dv_des)
        new_lam = lam + dlam
        ln = jnp.einsum("npi,npi->np", new_lam, n_srf)
        lt = new_lam - ln[..., None] * n_srf
        ln = jnp.maximum(ln, 0.0)
        lt_norm = jnp.linalg.norm(lt, axis=-1)
        max_t = mu * ln
        scale = jnp.where(lt_norm > max_t, max_t / jnp.maximum(lt_norm, 1e-9),
                          1.0)
        new_lam = ln[..., None] * n_srf + lt * scale[..., None]
        new_lam = jnp.where(active[..., None], new_lam, 0.0)
        gv = gv + jnp.einsum("npvi,npi->nv", MinvJT_p, new_lam - lam)
        return new_lam, gv

    lam, gv = jax.lax.fori_loop(0, num_iters, iter_body, (lam, gen_vel))
    return gv, lam


def test_pallas_matches_xla_reference():
    rng = np.random.RandomState(0)
    N, P, nv = 24, 28, 18
    J = jnp.asarray(rng.randn(N, P, 3, nv) * 0.5, jnp.float32)
    A = rng.randn(N, nv, nv) * 0.1
    Minv_like = jnp.asarray(
        np.einsum("nij,nkj->nik", A, A) + 0.05 * np.eye(nv), jnp.float32)
    MinvJT_p = jnp.einsum("nvw,npiw->npvi", Minv_like, J)
    W = jnp.einsum("npiv,npvj->npij", J, MinvJT_p) + 0.5 * jnp.eye(3)
    Lam = jnp.linalg.inv(W)
    n_srf = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N, P, 1))
    target_n = jnp.asarray(np.abs(rng.randn(N, P)) * 0.2, jnp.float32)
    mu = jnp.full((N, P), 0.8, jnp.float32)
    active = jnp.asarray(rng.rand(N, P) < 0.5)
    gen_vel = jnp.asarray(rng.randn(N, nv), jnp.float32)

    gv_ref, lam_ref = _xla_reference(J, MinvJT_p, Lam, n_srf, target_n, mu,
                                     active, gen_vel, 8, 0.4)
    gv_pal, lam_pal = contact_solve_pallas(J, MinvJT_p, Lam, n_srf, target_n,
                                           mu, active, gen_vel, 8, 0.4,
                                           block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(gv_pal), np.asarray(gv_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lam_pal), np.asarray(lam_ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_padding():
    """N not divisible by block exercises the padding path."""
    rng = np.random.RandomState(1)
    N, P, nv = 11, 28, 18
    J = jnp.asarray(rng.randn(N, P, 3, nv) * 0.3, jnp.float32)
    MinvJT_p = jnp.asarray(rng.randn(N, P, nv, 3) * 0.1, jnp.float32)
    Lam = jnp.tile(jnp.eye(3, dtype=jnp.float32), (N, P, 1, 1))
    n_srf = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N, P, 1))
    target_n = jnp.zeros((N, P), jnp.float32)
    mu = jnp.ones((N, P), jnp.float32)
    active = jnp.ones((N, P), bool)
    gen_vel = jnp.asarray(rng.randn(N, nv), jnp.float32)
    gv_ref, lam_ref = _xla_reference(J, MinvJT_p, Lam, n_srf, target_n, mu,
                                     active, gen_vel, 4, 0.4)
    gv_pal, lam_pal = contact_solve_pallas(J, MinvJT_p, Lam, n_srf, target_n,
                                           mu, active, gen_vel, 4, 0.4,
                                           block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(gv_pal), np.asarray(gv_ref),
                               rtol=2e-4, atol=2e-4)
