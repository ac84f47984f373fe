"""Learned Go1 actuator (motor) model.

TPU-native equivalent of the reference's TorchScript actuator network
(reference: go1_gym/envs/base/legged_robot.py:1238-1258 load + closure,
scripts/actuator_net/utils.py:66-79 architecture: MLP 6->32->32->1 with
softsign activations).  Input per joint: (q_err, q_err_last, q_err_last_last,
qd, qd_last, qd_last_last); output: torque.

Weights are stored as a plain .npz (converted once from the reference's
trained checkpoint — the network is a hardware-log-fitted artifact, i.e.
data, and is the sim-to-real contract for torque realism).  The forward pass
is a batched (N, 12, 6) x (6, 32) einsum chain — XLA fuses the whole thing
into a couple of MXU calls per physics substep.

A training pipeline for refitting from hardware logs lives in
scripts/actuator_net_train.py (parity with scripts/actuator_net/ in the
reference).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "resources", "actuator_nets", "unitree_go1.npz",
)


class ActuatorNetParams(NamedTuple):
    w0: jnp.ndarray  # (32, 6)
    b0: jnp.ndarray
    w1: jnp.ndarray  # (32, 32)
    b1: jnp.ndarray
    w2: jnp.ndarray  # (1, 32)
    b2: jnp.ndarray


def load(path: str = _DEFAULT_PATH) -> ActuatorNetParams:
    z = np.load(path)
    return ActuatorNetParams(
        w0=jnp.asarray(z["w0"]), b0=jnp.asarray(z["b0"]),
        w1=jnp.asarray(z["w1"]), b1=jnp.asarray(z["b1"]),
        w2=jnp.asarray(z["w2"]), b2=jnp.asarray(z["b2"]),
    )


def init_random(rng=None) -> ActuatorNetParams:
    """Random-init params (for tests / training from scratch)."""
    rs = np.random.RandomState(0 if rng is None else rng)

    def lin(o, i):
        lim = 1.0 / np.sqrt(i)
        return (jnp.asarray(rs.uniform(-lim, lim, (o, i)), dtype=jnp.float32),
                jnp.asarray(rs.uniform(-lim, lim, (o,)), dtype=jnp.float32))

    w0, b0 = lin(32, 6)
    w1, b1 = lin(32, 32)
    w2, b2 = lin(1, 32)
    return ActuatorNetParams(w0, b0, w1, b1, w2, b2)


def _softsign(x):
    return x / (1.0 + jnp.abs(x))


def apply(params: ActuatorNetParams, x: jnp.ndarray) -> jnp.ndarray:
    """x: (..., 6) -> torque (...)."""
    h = _softsign(x @ params.w0.T + params.b0)
    h = _softsign(h @ params.w1.T + params.b1)
    return (h @ params.w2.T + params.b2)[..., 0]


def eval_torques(
    params: ActuatorNetParams,
    joint_pos_err, joint_pos_err_last, joint_pos_err_last_last,
    joint_vel, joint_vel_last, joint_vel_last_last,
) -> jnp.ndarray:
    """Reference input stacking (legged_robot.py:1242-1251). All (N, 12)."""
    xs = jnp.stack(
        [joint_pos_err, joint_pos_err_last, joint_pos_err_last_last,
         joint_vel, joint_vel_last, joint_vel_last_last],
        axis=-1,
    )  # (N, 12, 6)
    return apply(params, xs)
