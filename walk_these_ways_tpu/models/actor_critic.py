"""Actor-critic for concurrent state estimation (ppo_cse variant).

TPU-native rebuild of the reference ActorCritic (reference:
go1_gym_learn/ppo_cse/actor_critic.py:19-147):

- adaptation_module: obs_history (2100) -> [256, 128] -> num_privileged (2)
- actor_body:  obs_history + latent (2102) -> [512, 256, 128] -> 12
- critic_body: obs_history + priv   (2102) -> [512, 256, 128] -> 1
- learned state-independent log-free std (init 1.0), Normal policy.

Parameters are plain pytrees (NamedTuple of (W, b) lists) — no framework
dependency, trivially shardable/exportable.  Init matches torch's Linear
default (kaiming-uniform == U[-1/sqrt(fan_in), 1/sqrt(fan_in)] for both W
and b) so learning dynamics are comparable.  Activation: ELU.

Forward passes are (batch, features) matmul chains in bf16-friendly f32 —
XLA maps them straight onto the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AC_Args:
    """reference actor_critic.py:7-17"""
    init_noise_std: float = 1.0
    actor_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    critic_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    adaptation_module_branch_hidden_dims: Tuple[int, ...] = (256, 128)


class MLPParams(NamedTuple):
    weights: Tuple[jnp.ndarray, ...]
    biases: Tuple[jnp.ndarray, ...]


class ACParams(NamedTuple):
    adaptation: MLPParams
    actor: MLPParams
    critic: MLPParams
    std: jnp.ndarray  # (num_actions,)


def _init_mlp(rng, sizes: Sequence[int]) -> MLPParams:
    ws, bs = [], []
    for i in range(len(sizes) - 1):
        rng, k1, k2 = jax.random.split(rng, 3)
        fan_in = sizes[i]
        lim = 1.0 / np.sqrt(fan_in)
        ws.append(jax.random.uniform(
            k1, (sizes[i], sizes[i + 1]), minval=-lim, maxval=lim))
        bs.append(jax.random.uniform(
            k2, (sizes[i + 1],), minval=-lim, maxval=lim))
    return MLPParams(weights=tuple(ws), biases=tuple(bs))


def mlp_apply(p: MLPParams, x: jnp.ndarray) -> jnp.ndarray:
    n = len(p.weights)
    for i, (w, b) in enumerate(zip(p.weights, p.biases)):
        x = x @ w + b
        if i < n - 1:
            x = jax.nn.elu(x)
    return x


def init(rng, num_obs: int, num_privileged_obs: int, num_obs_history: int,
         num_actions: int, args: AC_Args = AC_Args()) -> ACParams:
    k1, k2, k3 = jax.random.split(rng, 3)
    adaptation = _init_mlp(
        k1, [num_obs_history, *args.adaptation_module_branch_hidden_dims,
             num_privileged_obs])
    actor = _init_mlp(
        k2, [num_privileged_obs + num_obs_history, *args.actor_hidden_dims,
             num_actions])
    critic = _init_mlp(
        k3, [num_privileged_obs + num_obs_history, *args.critic_hidden_dims, 1])
    std = args.init_noise_std * jnp.ones(num_actions)
    return ACParams(adaptation=adaptation, actor=actor, critic=critic, std=std)


# -- policy heads (reference actor_critic.py:113-147) -----------------------

def adaptation_forward(p: ACParams, obs_history):
    return mlp_apply(p.adaptation, obs_history)


def actor_mean(p: ACParams, obs_history):
    """Student: history -> latent -> action mean (update_distribution)."""
    latent = adaptation_forward(p, obs_history)
    return mlp_apply(p.actor, jnp.concatenate([obs_history, latent], axis=-1))


def act_teacher(p: ACParams, obs_history, privileged_obs):
    return mlp_apply(
        p.actor, jnp.concatenate([obs_history, privileged_obs], axis=-1))


def evaluate(p: ACParams, obs_history, privileged_obs):
    v = mlp_apply(
        p.critic, jnp.concatenate([obs_history, privileged_obs], axis=-1))
    return v[..., 0]


def sample_actions(p: ACParams, obs_history, rng):
    """Returns (actions, log_prob, mean, std)."""
    mean = actor_mean(p, obs_history)
    std = jnp.broadcast_to(p.std, mean.shape)
    eps = jax.random.normal(rng, mean.shape)
    actions = mean + std * eps
    logp = gaussian_log_prob(actions, mean, std)
    return actions, logp, mean, std


def gaussian_log_prob(x, mean, std):
    var = jnp.square(std)
    lp = -0.5 * jnp.square(x - mean) / var - jnp.log(std) \
        - 0.5 * jnp.log(2 * jnp.pi)
    return jnp.sum(lp, axis=-1)


def gaussian_entropy(std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std), axis=-1)
