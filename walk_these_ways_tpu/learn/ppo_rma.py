"""RMA-style teacher-student PPO (the reference's ``ppo/`` variant).

Rebuild of go1_gym_learn/ppo/ (reference: ppo/actor_critic.py:38-56 —
explicit env-factor encoder priv_obs -> latent feeding the actor on the
CURRENT obs (not history); ppo/ppo.py:64-65 — the policy acts on
obs (+ encoder latent); ppo/ppo.py:150-170 — the adaptation module distills
the encoder output from obs history with MSE).  The ``ppo_cse`` variant in
learn/ppo.py is what scripts/train.py uses; this one is kept for API parity
and ablations.

Implementation shares the machinery of learn/ppo.py where possible; the
differences are the parameter set and the actor/adaptation targets.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import actor_critic as ac
from .ppo import IterMetrics, PPO_Args, make_optimizers


@dataclasses.dataclass(frozen=True)
class RMA_Args:
    """reference ppo/actor_critic.py:7-24"""
    init_noise_std: float = 1.0
    actor_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    critic_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    encoder_hidden_dims: Tuple[int, ...] = (256, 128)
    adaptation_hidden_dims: Tuple[int, ...] = (256, 32)
    latent_dim: int = 18


class RMAParams(NamedTuple):
    encoder: ac.MLPParams       # priv_obs -> latent
    adaptation: ac.MLPParams    # obs_history -> latent (distilled)
    actor: ac.MLPParams         # obs + latent -> actions
    critic: ac.MLPParams        # obs + latent -> value
    std: jnp.ndarray


def init(rng, num_obs, num_privileged_obs, num_obs_history, num_actions,
         args: RMA_Args = RMA_Args()) -> RMAParams:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    enc = ac._init_mlp(k1, [num_privileged_obs, *args.encoder_hidden_dims,
                            args.latent_dim])
    adapt = ac._init_mlp(k2, [num_obs_history, *args.adaptation_hidden_dims,
                              args.latent_dim])
    actor = ac._init_mlp(k3, [num_obs + args.latent_dim,
                              *args.actor_hidden_dims, num_actions])
    critic = ac._init_mlp(k4, [num_obs + args.latent_dim,
                               *args.critic_hidden_dims, 1])
    return RMAParams(encoder=enc, adaptation=adapt, actor=actor,
                     critic=critic, std=args.init_noise_std * jnp.ones(num_actions))


def teacher_mean(p: RMAParams, obs, priv_obs):
    latent = ac.mlp_apply(p.encoder, priv_obs)
    return ac.mlp_apply(p.actor, jnp.concatenate([obs, latent], -1)), latent


def student_mean(p: RMAParams, obs, obs_history):
    latent = ac.mlp_apply(p.adaptation, obs_history)
    return ac.mlp_apply(p.actor, jnp.concatenate([obs, latent], -1))


def evaluate(p: RMAParams, obs, priv_obs):
    latent = ac.mlp_apply(p.encoder, priv_obs)
    v = ac.mlp_apply(p.critic, jnp.concatenate([obs, latent], -1))
    return v[..., 0]


class RMATrainState(NamedTuple):
    params: RMAParams
    opt_state: Any
    adapt_opt_state: Any
    lr: jnp.ndarray
    rng: jax.Array
    iteration: jnp.ndarray


def init_train_state(rng, env, args: PPO_Args = PPO_Args()) -> RMATrainState:
    k_params, k_rng = jax.random.split(rng)
    params = init(k_params, env.num_obs, env.num_privileged_obs,
                  env.num_obs_history, env.num_actions)
    main_opt, adapt_opt = make_optimizers(args)
    return RMATrainState(
        params=params, opt_state=main_opt.init(params),
        adapt_opt_state=adapt_opt.init(params.adaptation),
        lr=jnp.asarray(args.learning_rate), rng=k_rng,
        iteration=jnp.zeros((), jnp.int32))


def make_train_iteration(env, args: PPO_Args = PPO_Args(), num_steps: int = 24,
                         eval_expert: bool = False):
    """Teacher-policy PPO + adaptation distillation, one jitted iteration.

    Same signature/metrics contract as ppo.make_train_iteration so the
    Runner can drive either variant.  Train/eval env split mirrors the cse
    path: the first env.num_train_envs envs act with the sampled teacher
    and feed PPO; eval envs act deterministically with the distilled
    student (or the teacher when `eval_expert`) and contribute only to the
    eval episode metrics (reference ppo/__init__.py rollout split).
    """
    main_opt, adapt_opt = make_optimizers(args)
    Ttrain = env.num_train_envs
    has_eval = env.num_eval_envs > 0

    def rollout_step(carry, _):
        env_state, obs_dict, params, rng = carry
        rng, k = jax.random.split(rng)
        obs, priv, hist = (obs_dict["obs"], obs_dict["privileged_obs"],
                           obs_dict["obs_history"])
        mean, _ = teacher_mean(params, obs[:Ttrain], priv[:Ttrain])
        std = jnp.broadcast_to(params.std, mean.shape)
        actions_tr = mean + std * jax.random.normal(k, mean.shape)
        logp = ac.gaussian_log_prob(actions_tr, mean, std)
        values = evaluate(params, obs[:Ttrain], priv[:Ttrain])
        if has_eval:
            if eval_expert:
                actions_ev, _ = teacher_mean(params, obs[Ttrain:],
                                             priv[Ttrain:])
            else:
                actions_ev = student_mean(params, obs[Ttrain:],
                                          hist[Ttrain:])
            actions = jnp.concatenate([actions_tr, actions_ev], axis=0)
        else:
            actions = actions_tr
        env_state, new_obs, rew, done, info = env.step(env_state, actions)
        rew = rew[:Ttrain] + args.gamma * values * info.time_outs[:Ttrain]
        done_tr = done[:Ttrain]
        t = (obs[:Ttrain], priv[:Ttrain], hist[:Ttrain], actions_tr, rew,
             done_tr, values, logp, mean, std)
        log = (info.ep_sums_done, info.ep_count_done, info.ep_len_done,
               info.eval_ep_sums_done, info.eval_ep_count_done,
               info.eval_ep_len_done, info.envelope_exits)
        return (env_state, new_obs, params, rng), (t, log)

    def train_iteration(env_state, obs_dict, ts: RMATrainState):
        rng, k_roll, k_perm = jax.random.split(ts.rng, 3)
        (env_state, obs_dict, _, _), (traj, logs) = jax.lax.scan(
            rollout_step, (env_state, obs_dict, ts.params, k_roll),
            None, length=num_steps)
        (obs_t, priv_t, hist_t, act_t, rew_t, done_t, val_t, logp_t,
         mu_t, sig_t) = traj

        last_values = evaluate(ts.params, obs_dict["obs"][:Ttrain],
                               obs_dict["privileged_obs"][:Ttrain])

        def scan_fn(adv, x):
            r, d, v, nv = x
            nt = 1.0 - d.astype(jnp.float32)
            delta = r + nt * args.gamma * nv - v
            adv = delta + nt * args.gamma * args.lam * adv
            return adv, adv

        next_v = jnp.concatenate([val_t[1:], last_values[None]], 0)
        _, advs = jax.lax.scan(scan_fn, jnp.zeros_like(last_values),
                               (rew_t, done_t, val_t, next_v), reverse=True)
        returns = advs + val_t
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)

        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        T, N = rew_t.shape
        batch = T * N
        mb = batch // args.num_mini_batches
        data = tuple(map(flat, (obs_t, priv_t, hist_t, act_t, logp_t, mu_t,
                                sig_t, val_t, returns, advs)))
        perm = jax.random.permutation(k_perm, batch)
        idxs = jnp.tile(perm[: mb * args.num_mini_batches].reshape(
            args.num_mini_batches, mb), (args.num_learning_epochs, 1))

        def minibatch(carry, idx):
            params, opt_state, adapt_opt_state, lr = carry
            (obs_f, priv_f, hist_f, act_f, logp_f, mu_f, sig_f, val_f,
             ret_f, adv_f) = data
            o, pv, h = obs_f[idx], priv_f[idx], hist_f[idx]
            a, olp, omu, osig = act_f[idx], logp_f[idx], mu_f[idx], sig_f[idx]
            tv, ret, adv = val_f[idx], ret_f[idx], adv_f[idx]

            def loss_fn(p):
                mean, _ = teacher_mean(p, o, pv)
                std = jnp.broadcast_to(p.std, mean.shape)
                logp = ac.gaussian_log_prob(a, mean, std)
                value = evaluate(p, o, pv)
                ratio = jnp.exp(logp - olp)
                surr = jnp.maximum(-adv * ratio, -adv * jnp.clip(
                    ratio, 1 - args.clip_param, 1 + args.clip_param)).mean()
                vc = tv + jnp.clip(value - tv, -args.clip_param, args.clip_param)
                vl = jnp.maximum(jnp.square(value - ret),
                                 jnp.square(vc - ret)).mean()
                ent = ac.gaussian_entropy(std).mean()
                return surr + args.value_loss_coef * vl \
                    - args.entropy_coef * ent, (mean, std, vl, surr)

            (loss, (mu_b, sig_b, vl, sl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            kl = jnp.mean(jnp.sum(
                jnp.log(sig_b / osig + 1e-5)
                + (jnp.square(osig) + jnp.square(omu - mu_b))
                / (2 * jnp.square(sig_b)) - 0.5, axis=-1))
            lr = jnp.where(kl > args.desired_kl * 2, jnp.maximum(1e-5, lr / 1.5), lr)
            lr = jnp.where((kl < args.desired_kl / 2) & (kl > 0),
                           jnp.minimum(1e-2, lr * 1.5), lr)
            # KL-adaptive LR: functional update via optax tree_set (the
            # in-place hyperparams-dict mutation worked but relied on
            # optax internals being a mutable dict inside the jit trace)
            opt_state = optax.tree_utils.tree_set(
                opt_state, learning_rate=lr)
            updates, opt_state = main_opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            # distillation: adaptation(hist) -> encoder(priv) (ppo.py:157-163)
            def adapt_loss(adapt_p):
                pred = ac.mlp_apply(adapt_p, h)
                target = ac.mlp_apply(params.encoder, pv)
                return jnp.mean(jnp.square(pred - target))

            al, agrads = jax.value_and_grad(adapt_loss)(params.adaptation)
            aupd, adapt_opt_state = adapt_opt.update(
                agrads, adapt_opt_state, params.adaptation)
            params = params._replace(
                adaptation=optax.apply_updates(params.adaptation, aupd))
            return (params, opt_state, adapt_opt_state, lr), (vl, sl, al, kl)

        carry, ms = jax.lax.scan(
            minibatch, (ts.params, ts.opt_state, ts.adapt_opt_state, ts.lr),
            idxs)
        params, opt_state, adapt_opt_state, lr = carry
        # Same IterMetrics tuple as the cse path so the Runner can log
        # either variant.  The reference RMA update has no 80/20 adaptation
        # test split (ppo/ppo.py:157-170) — report the train loss for both.
        metrics = IterMetrics(
            value_loss=jnp.mean(ms[0]),
            surrogate_loss=jnp.mean(ms[1]),
            adaptation_loss=jnp.mean(ms[2]),
            adaptation_test_loss=jnp.mean(ms[2]),
            mean_kl=jnp.mean(ms[3]),
            lr=lr,
            mean_reward=jnp.mean(rew_t),
            ep_sums_done=jnp.sum(logs[0], axis=0),
            ep_count_done=jnp.sum(logs[1]),
            ep_len_done=jnp.sum(logs[2]),
            eval_ep_sums_done=jnp.sum(logs[3], axis=0),
            eval_ep_count_done=jnp.sum(logs[4]),
            eval_ep_len_done=jnp.sum(logs[5]),
            envelope_exits=jnp.sum(logs[6]),
            curriculum_area=jnp.mean(env_state.curriculum.weights, axis=-1),
        )
        ts = RMATrainState(params=params, opt_state=opt_state,
                           adapt_opt_state=adapt_opt_state, lr=lr, rng=rng,
                           iteration=ts.iteration + 1)
        return env_state, obs_dict, ts, metrics

    return train_iteration
