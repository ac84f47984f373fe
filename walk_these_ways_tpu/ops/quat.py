"""Quaternion and rotation ops (TPU-native JAX).

Convention: quaternions are stored ``(x, y, z, w)`` — the IsaacGym layout the
reference uses for ``root_states[:, 3:7]`` (reference:
go1_gym/envs/base/legged_robot.py:107) — so observation layouts and checkpoints
stay layout-compatible.

All functions broadcast over arbitrary leading batch dimensions and are
jit/vmap-safe (no Python control flow on traced values).
"""
from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basics
# ---------------------------------------------------------------------------


def normalize(v: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Normalize along the last axis."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, xyzw layout."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (active rotation)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q (world -> body for a body-to-world q)."""
    return quat_apply(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """angle: (...,), axis: (..., 3) or (3,). Returns (..., 4) xyzw."""
    axis = normalize(jnp.broadcast_to(axis, angle.shape + (3,)))
    half = 0.5 * angle
    s = jnp.sin(half)[..., None]
    return jnp.concatenate([axis * s, jnp.cos(half)[..., None]], axis=-1)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q.

    Matches reference go1_gym/utils/math_utils.py:12-16 (zero the x/y
    components, renormalize, rotate).
    """
    q_yaw = jnp.concatenate([jnp.zeros_like(q[..., :2]), q[..., 2:]], axis=-1)
    return quat_apply(normalize(q_yaw), v)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyzw -> (..., 3, 3) rotation matrix (body-to-world)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_euler_xyz(roll, pitch, yaw):
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_euler_xyz(q: jnp.ndarray):
    """Returns (roll, pitch, yaw)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch_arg = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(pitch_arg)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation with world-frame angular velocity (exp map)."""
    angle = jnp.linalg.norm(omega_world, axis=-1)
    # guard the 0/0 at rest; sinc-style limit
    axis = omega_world / jnp.maximum(angle, 1e-9)[..., None]
    dq = quat_from_angle_axis(angle * dt, axis)
    return normalize(quat_mul(dq, q))


def wrap_to_pi(angles: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]; matches reference math_utils.py:20-23."""
    a = jnp.mod(angles, 2 * jnp.pi)
    return a - 2 * jnp.pi * (a > jnp.pi)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def yaw_quat(q: jnp.ndarray) -> jnp.ndarray:
    """The yaw-only quaternion of q."""
    q_yaw = jnp.concatenate([jnp.zeros_like(q[..., :2]), q[..., 2:]], axis=-1)
    return normalize(q_yaw)
