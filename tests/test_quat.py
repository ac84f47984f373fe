"""Quaternion op tests against closed-form oracles (xyzw layout)."""
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.ops import quat as q


def test_identity_apply():
    v = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(q.quat_apply(q.quat_identity((1,)), v), v, atol=1e-6)


def test_yaw_rotation():
    # 90 deg about z maps x->y
    qz = q.quat_from_angle_axis(jnp.array([np.pi / 2]), jnp.array([0.0, 0.0, 1.0]))
    out = q.quat_apply(qz, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-6)


def test_rotate_inverse_roundtrip():
    rng = np.random.RandomState(0)
    quat = q.normalize(jnp.asarray(rng.randn(16, 4)))
    v = jnp.asarray(rng.randn(16, 3))
    out = q.quat_rotate_inverse(quat, q.quat_apply(quat, v))
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_rotmat_consistency():
    rng = np.random.RandomState(1)
    quat = q.normalize(jnp.asarray(rng.randn(8, 4)))
    v = jnp.asarray(rng.randn(8, 3))
    a = q.quat_apply(quat, v)
    b = jnp.einsum("nij,nj->ni", q.quat_to_rotmat(quat), v)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_quat_apply_yaw_matches_reference_semantics():
    # reference semantics (math_utils.py:12-16): zero x/y, renormalize, rotate.
    # The result is a pure rotation about z by 2*atan2(qz, qw).
    quat = q.quat_from_euler_xyz(jnp.array(0.3), jnp.array(-0.2), jnp.array(1.1))
    v = jnp.array([1.0, 0.0, 0.0])
    out = q.quat_apply_yaw(quat[None], v[None])[0]
    psi = 2 * np.arctan2(float(quat[2]), float(quat[3]))
    expect = jnp.array([np.cos(psi), np.sin(psi), 0.0])
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_euler_roundtrip():
    r, p, y = jnp.array(0.2), jnp.array(-0.4), jnp.array(2.0)
    quat = q.quat_from_euler_xyz(r, p, y)
    rr, pp, yy = q.quat_to_euler_xyz(quat)
    np.testing.assert_allclose([rr, pp, yy], [0.2, -0.4, 2.0], atol=1e-5)


def test_wrap_to_pi():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.5])
    out = np.asarray(q.wrap_to_pi(a))
    assert (out <= np.pi + 1e-6).all() and (out > -np.pi - 1e-6).all()
    np.testing.assert_allclose(out[3], 0.5, atol=1e-5)


def test_integrate_constant_omega():
    quat = q.quat_identity((1,))
    omega = jnp.array([[0.0, 0.0, 1.0]])  # 1 rad/s yaw
    for _ in range(100):
        quat = q.quat_integrate(quat, omega, 0.01)
    _, _, yaw = q.quat_to_euler_xyz(quat)
    np.testing.assert_allclose(yaw, 1.0, atol=1e-4)
