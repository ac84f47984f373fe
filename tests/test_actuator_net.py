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
    # oracle outputs from
    #   torch.jit.load('resources/actuator_nets/unitree_go1.pt',
    #                  map_location='cpu')(x)
    # captured offline (torch 2.x CPU):
    oracle = np.asarray([-0.0040676, -1.7452395, 3.3630688], np.float32)
    np.testing.assert_allclose(y, oracle, atol=2e-6)


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
