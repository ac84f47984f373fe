"""Device mesh + sharding helpers.

The reference has no multi-device capability at all (single-GPU IsaacGym,
SURVEY.md §2.5); the TPU-native scale-out design is: a 1-D mesh over the
``env`` axis, env-state arrays sharded on their leading (num_envs) dim,
network/optimizer state replicated.  Everything in the jitted train
iteration is either elementwise/batched over envs (physics, rewards,
rollout) or a global reduction (advantage normalization, gradient psum,
curriculum scatter) — GSPMD propagates the shardings and inserts ICI
collectives; there is no hand-written communication.

On a real multi-host pod slice the same code runs under
``jax.distributed.initialize`` with the env axis spanning hosts (DCN) and
chips (ICI).  Tests exercise this on a virtual 8-device CPU mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Multi-host entry: join the jax runtime cluster so jax.devices()
    spans every host's chips and the env mesh axis crosses DCN.

    Uses jax.distributed.initialize()'s autodetection (TPU pod metadata,
    or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env
    vars).  Idempotent: a second call is a no-op, and a single-process
    run without coordinator config falls through silently so the same
    scripts/train.py invocation works on one chip and on a pod slice."""
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # already initialized, or single-process with no coordinator


def make_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(tree, mesh: Mesh, num_envs: int, axis: str = "env"):
    """Place every array whose leading dim == num_envs on the env axis;
    replicate everything else (scalars, curriculum weights, RNG keys)."""
    s_env = env_sharding(mesh, axis)
    s_rep = replicated(mesh)

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, s_env)
        return jax.device_put(x, s_rep)

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), s), tree)
