"""Corner-packed heightfield lookup (round-5 rough-terrain perf fix).

`make_heightfield_terrain` precomputes corners[i,j] = the 2x2 cell corner
heights so `Terrain.lookup` issues ONE gather of a contiguous 4-float
slice per query point instead of four scalar gathers (TPU gathers are
index-bound; the four were 44% of the rough train iteration).  These
tests pin the contract: bit-identical height/normal vs the four-gather
reference path, including at clamped out-of-range queries.
"""
import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.physics import engine as E


def _pair(h, hs=0.1, origin=(-1.0, -2.0)):
    packed = E.make_heightfield_terrain(h, hs, origin)
    plain = E.Terrain(height=jnp.asarray(h, jnp.float32),
                      horizontal_scale=hs, origin_xy=origin)
    assert packed.corners is not None and plain.corners is None
    return packed, plain


def test_corner_packed_lookup_bit_identical():
    rng = np.random.RandomState(0)
    h = rng.uniform(-0.3, 0.5, (64, 80)).astype(np.float32)
    packed, plain = _pair(h)
    x = jnp.asarray(rng.uniform(-1.5, 5.5, (4096,)), jnp.float32)
    y = jnp.asarray(rng.uniform(-2.5, 6.0, (4096,)), jnp.float32)
    h1, n1 = packed.lookup(x, y)
    h0, n0 = plain.lookup(x, y)
    assert bool(jnp.all(h1 == h0))
    assert bool(jnp.all(n1 == n0))


def test_corner_packed_lookup_out_of_range_clamps():
    rng = np.random.RandomState(1)
    h = rng.uniform(-0.2, 0.2, (16, 24)).astype(np.float32)
    packed, plain = _pair(h)
    # far outside the grid on every side: both paths clamp to the border
    x = jnp.asarray([-100.0, 100.0, -100.0, 100.0], jnp.float32)
    y = jnp.asarray([-100.0, -100.0, 100.0, 100.0], jnp.float32)
    h1, n1 = packed.lookup(x, y)
    h0, n0 = plain.lookup(x, y)
    assert bool(jnp.all(h1 == h0)) and bool(jnp.all(n1 == n0))
    assert bool(jnp.all(jnp.isfinite(h1)))


def test_corner_packed_lookup_jits_and_grads_flow():
    h = np.linspace(0, 1, 12 * 10, dtype=np.float32).reshape(12, 10)
    packed, _ = _pair(h)

    @jax.jit
    def f(x, y):
        hh, _ = packed.lookup(x, y)
        return jnp.sum(hh)

    x = jnp.asarray([0.05, 0.15], jnp.float32)
    y = jnp.asarray([-1.95, -1.85], jnp.float32)
    assert bool(jnp.isfinite(f(x, y)))
    g = jax.grad(f)(x, y)
    assert bool(jnp.all(jnp.isfinite(g)))
    # the field is non-constant here, so d(sum h)/dx must be nonzero
    assert bool(jnp.any(g != 0.0))
