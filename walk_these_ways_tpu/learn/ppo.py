"""PPO with concurrent state estimation (ppo_cse), fully jitted.

TPU-native rebuild of the reference trainer (reference:
go1_gym_learn/ppo_cse/ppo.py + rollout_storage.py + the rollout loop in
ppo_cse/__init__.py:138-206).  The whole training iteration — 24-step
rollout through the env, GAE, 5 epochs x 4 minibatches of clipped-surrogate
PPO with KL-adaptive LR, plus the supervised adaptation-module regression —
is ONE jitted program: no rollout-storage class (the stacked `lax.scan`
output IS the storage), no host round trips inside the iteration.

Parity notes (semantics matched to the reference, file:line):
- timeout bootstrap: rewards += gamma * value * time_out (ppo.py:84-86)
- GAE reverse scan (rollout_storage.py:76-90), advantages normalized over
  the whole batch
- one permutation per update reused across epochs (rollout_storage.py:100-124)
- KL-adaptive LR: x/ 1.5 outside [desired/2, 2*desired], clamped to
  [1e-5, 1e-2], adjusted per minibatch BEFORE the gradient step
  (ppo.py:118-132)
- the main Adam updates ALL params (incl. the adaptation module, which
  receives policy gradients through the actor's latent) with grad-norm clip
  1.0 (ppo.py:44,152-158)
- a second Adam(1e-3) trains only the adaptation module on MSE(pred, priv)
  over the first 80% of each minibatch, with the remaining 20% as test loss
  (ppo.py:163-192); it runs after the main step on the updated params.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import actor_critic as ac


@dataclasses.dataclass(frozen=True)
class PPO_Args:
    """reference ppo_cse/ppo.py:13-30"""
    value_loss_coef: float = 1.0
    use_clipped_value_loss: bool = True
    clip_param: float = 0.2
    entropy_coef: float = 0.01
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    learning_rate: float = 1e-3
    adaptation_module_learning_rate: float = 1e-3
    num_adaptation_module_substeps: int = 1
    schedule: str = "adaptive"
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0


class TrainState(NamedTuple):
    params: ac.ACParams
    opt_state: Any
    adapt_opt_state: Any
    lr: jnp.ndarray          # () adaptive learning rate
    rng: jax.Array
    iteration: jnp.ndarray   # () int32


class IterMetrics(NamedTuple):
    value_loss: jnp.ndarray
    surrogate_loss: jnp.ndarray
    adaptation_loss: jnp.ndarray
    adaptation_test_loss: jnp.ndarray
    mean_kl: jnp.ndarray
    lr: jnp.ndarray
    mean_reward: jnp.ndarray          # mean per-step reward this iter
    ep_sums_done: jnp.ndarray         # (n_terms+1,) summed over finished eps
    ep_count_done: jnp.ndarray
    ep_len_done: jnp.ndarray
    # eval-slice episode stats (zero when the env has no eval split)
    eval_ep_sums_done: jnp.ndarray
    eval_ep_count_done: jnp.ndarray
    eval_ep_len_done: jnp.ndarray
    curriculum_area: jnp.ndarray      # (C,) mean weight per gait category
    # crash-guard terminations this iteration (runs/seed2_blowup fix 3);
    # a healthy run logs 0 throughout
    envelope_exits: jnp.ndarray


def make_optimizers(args: PPO_Args):
    main = optax.chain(
        optax.clip_by_global_norm(args.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(
            learning_rate=args.learning_rate, eps=1e-8),
    )
    adapt = optax.adam(args.adaptation_module_learning_rate, eps=1e-8)
    return main, adapt


def init_train_state(rng, env, args: PPO_Args = PPO_Args()) -> TrainState:
    k_params, k_rng = jax.random.split(rng)
    params = ac.init(k_params, env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions)
    main_opt, adapt_opt = make_optimizers(args)
    return TrainState(
        params=params,
        opt_state=main_opt.init(params),
        adapt_opt_state=adapt_opt.init(params.adaptation),
        lr=jnp.asarray(args.learning_rate),
        rng=k_rng,
        iteration=jnp.zeros((), jnp.int32),
    )


class Transition(NamedTuple):
    obs_history: jnp.ndarray
    privileged_obs: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    log_probs: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray


def make_train_iteration(env, args: PPO_Args = PPO_Args(),
                         num_steps: int = 24, eval_expert: bool = False):
    """Build the jittable one-iteration training function.

    Returns fn: (env_state, obs_dict, train_state) ->
                (env_state, obs_dict, train_state, IterMetrics)

    Train/eval env split (reference ppo_cse/__init__.py:140-147): the
    first env.num_train_envs envs act with the sampled student policy and
    feed PPO; any eval envs after them act deterministically (student
    mean, or teacher when `eval_expert`) and contribute only to the
    eval episode metrics.
    """
    main_opt, adapt_opt = make_optimizers(args)
    Ttrain = env.num_train_envs
    has_eval = env.num_eval_envs > 0

    def rollout_step(carry, _):
        env_state, obs_dict, params, rng = carry
        rng, k_act = jax.random.split(rng)
        hist = obs_dict["obs_history"]
        priv = obs_dict["privileged_obs"]
        actions_tr, logp, mu, sigma = ac.sample_actions(
            params, hist[:Ttrain], k_act)
        if has_eval:
            if eval_expert:
                actions_ev = ac.act_teacher(params, hist[Ttrain:],
                                            priv[Ttrain:])
            else:
                actions_ev = ac.actor_mean(params, hist[Ttrain:])
            actions = jnp.concatenate([actions_tr, actions_ev], axis=0)
        else:
            actions = actions_tr
        values = ac.evaluate(params, hist[:Ttrain], priv[:Ttrain])
        env_state, new_obs, rew, done, info = env.step(env_state, actions)
        rew = rew[:Ttrain]
        done_tr = done[:Ttrain]
        # timeout bootstrap (ppo.py:84-86)
        rew = rew + args.gamma * values * info.time_outs[:Ttrain]
        t = Transition(
            obs_history=hist[:Ttrain], privileged_obs=priv[:Ttrain],
            actions=actions_tr, rewards=rew, dones=done_tr, values=values,
            log_probs=logp, mu=mu, sigma=sigma)
        log = (info.ep_sums_done, info.ep_count_done, info.ep_len_done,
               info.eval_ep_sums_done, info.eval_ep_count_done,
               info.eval_ep_len_done, info.envelope_exits)
        return (env_state, new_obs, params, rng), (t, log)

    def compute_gae(traj: Transition, last_values):
        def scan_fn(carry, t):
            adv = carry
            not_terminal = 1.0 - t.dones.astype(jnp.float32)
            delta = t.rewards + not_terminal * args.gamma * t.next_values \
                - t.values
            adv = delta + not_terminal * args.gamma * args.lam * adv
            return adv, adv

        next_values = jnp.concatenate(
            [traj.values[1:], last_values[None]], axis=0)

        class _T(NamedTuple):
            rewards: jnp.ndarray
            dones: jnp.ndarray
            values: jnp.ndarray
            next_values: jnp.ndarray
        seq = _T(traj.rewards, traj.dones, traj.values, next_values)
        _, advs = jax.lax.scan(
            scan_fn, jnp.zeros_like(last_values), seq, reverse=True)
        returns = advs + traj.values
        norm_advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        return returns, norm_advs

    def minibatch_update(carry, start):
        params, opt_state, adapt_opt_state, lr, data = carry
        (hist, priv, actions, old_logp, old_mu, old_sigma, target_values,
         returns, advantages) = data
        # data is pre-permuted once per update; minibatches are contiguous
        # dynamic slices (no per-minibatch gather over the 100s-of-MB batch)
        mb = hist.shape[0] // args.num_mini_batches

        def take(x):
            return jax.lax.dynamic_slice_in_dim(x, start, mb, axis=0)

        hist_mb = take(hist)
        priv_mb = take(priv)
        act_mb = take(actions)
        old_logp_mb = take(old_logp)
        old_mu_mb = take(old_mu)
        old_sigma_mb = take(old_sigma)
        tv_mb = take(target_values)
        ret_mb = take(returns)
        adv_mb = take(advantages)

        def loss_fn(p):
            mean = ac.actor_mean(p, hist_mb)
            std = jnp.broadcast_to(p.std, mean.shape)
            logp = ac.gaussian_log_prob(act_mb, mean, std)
            value = ac.evaluate(p, hist_mb, priv_mb)
            ratio = jnp.exp(logp - old_logp_mb)
            surr = -adv_mb * ratio
            surr_clipped = -adv_mb * jnp.clip(
                ratio, 1.0 - args.clip_param, 1.0 + args.clip_param)
            surrogate_loss = jnp.mean(jnp.maximum(surr, surr_clipped))
            if args.use_clipped_value_loss:
                v_clipped = tv_mb + jnp.clip(
                    value - tv_mb, -args.clip_param, args.clip_param)
                v_loss = jnp.maximum(
                    jnp.square(value - ret_mb),
                    jnp.square(v_clipped - ret_mb)).mean()
            else:
                v_loss = jnp.square(ret_mb - value).mean()
            entropy = ac.gaussian_entropy(std)
            loss = surrogate_loss + args.value_loss_coef * v_loss \
                - args.entropy_coef * entropy.mean()
            return loss, (mean, std, v_loss, surrogate_loss)

        (loss, (mu_b, sigma_b, v_loss, s_loss)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)

        # KL-adaptive LR BEFORE the gradient step (ppo.py:118-132)
        kl = jnp.sum(
            jnp.log(sigma_b / old_sigma_mb + 1e-5)
            + (jnp.square(old_sigma_mb) + jnp.square(old_mu_mb - mu_b))
            / (2.0 * jnp.square(sigma_b)) - 0.5, axis=-1)
        kl_mean = jnp.mean(kl)
        lr = jnp.where(kl_mean > args.desired_kl * 2.0,
                       jnp.maximum(1e-5, lr / 1.5), lr)
        lr = jnp.where(
            (kl_mean < args.desired_kl / 2.0) & (kl_mean > 0.0),
            jnp.minimum(1e-2, lr * 1.5), lr)
        # KL-adaptive LR: functional update via optax tree_set (the
        # in-place hyperparams-dict mutation worked but relied on
        # optax internals being a mutable dict inside the jit trace)
        opt_state = optax.tree_utils.tree_set(
            opt_state, learning_rate=lr)
        updates, opt_state = main_opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # adaptation substep on the updated params (ppo.py:163-192)
        n_mb = hist_mb.shape[0]
        num_train = n_mb // 5 * 4

        def adapt_loss_fn(adapt_params):
            p = params._replace(adaptation=adapt_params)
            pred = ac.adaptation_forward(p, hist_mb)
            train_loss = jnp.mean(
                jnp.square(pred[:num_train] - priv_mb[:num_train]))
            test_loss = jnp.mean(
                jnp.square(pred[num_train:] - priv_mb[num_train:]))
            return train_loss, test_loss

        a_loss = jnp.zeros(())
        a_test = jnp.zeros(())
        for _ in range(args.num_adaptation_module_substeps):
            (a_loss, a_test), a_grads = jax.value_and_grad(
                adapt_loss_fn, has_aux=True)(params.adaptation)
            a_updates, adapt_opt_state = adapt_opt.update(
                a_grads, adapt_opt_state, params.adaptation)
            params = params._replace(
                adaptation=optax.apply_updates(params.adaptation, a_updates))

        metrics = (v_loss, s_loss, a_loss, a_test, kl_mean)
        return (params, opt_state, adapt_opt_state, lr, data), metrics

    def train_iteration(env_state, obs_dict, ts: TrainState):
        rng, k_roll, k_perm = jax.random.split(ts.rng, 3)

        # -- rollout (ppo_cse/__init__.py:138-186) ------------------------
        (env_state, obs_dict, _, _), (traj, logs) = jax.lax.scan(
            rollout_step, (env_state, obs_dict, ts.params, k_roll),
            None, length=num_steps)
        ep_sums_done = jnp.sum(logs[0], axis=0)
        ep_count_done = jnp.sum(logs[1])
        ep_len_done = jnp.sum(logs[2])
        eval_ep_sums_done = jnp.sum(logs[3], axis=0)
        eval_ep_count_done = jnp.sum(logs[4])
        eval_ep_len_done = jnp.sum(logs[5])
        envelope_exits = jnp.sum(logs[6])

        # -- GAE (ppo.py:93-95) -------------------------------------------
        last_values = ac.evaluate(ts.params,
                                  obs_dict["obs_history"][:Ttrain],
                                  obs_dict["privileged_obs"][:Ttrain])
        returns, advantages = compute_gae(traj, last_values)

        # -- flatten (T, N, ...) -> (T*N, ...) ----------------------------
        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        T, N = traj.rewards.shape
        batch = T * N
        mb_size = batch // args.num_mini_batches
        perm = jax.random.permutation(k_perm, batch)
        # shuffle ONCE, then slice contiguous minibatches; the same
        # permutation is reused across epochs (rollout_storage.py:103)
        data = tuple(
            flat(x)[perm]
            for x in (traj.obs_history, traj.privileged_obs, traj.actions,
                      traj.log_probs, traj.mu, traj.sigma, traj.values,
                      returns, advantages))
        starts = jnp.tile(
            jnp.arange(args.num_mini_batches, dtype=jnp.int32) * mb_size,
            args.num_learning_epochs)

        carry = (ts.params, ts.opt_state, ts.adapt_opt_state, ts.lr, data)
        carry, ms = jax.lax.scan(minibatch_update, carry, starts)
        params, opt_state, adapt_opt_state, lr, _ = carry

        n_updates = args.num_learning_epochs * args.num_mini_batches
        metrics = IterMetrics(
            value_loss=jnp.mean(ms[0]),
            surrogate_loss=jnp.mean(ms[1]),
            adaptation_loss=jnp.mean(ms[2]),
            adaptation_test_loss=jnp.mean(ms[3]),
            mean_kl=jnp.mean(ms[4]),
            lr=lr,
            mean_reward=jnp.mean(traj.rewards),
            ep_sums_done=ep_sums_done,
            ep_count_done=ep_count_done,
            ep_len_done=ep_len_done,
            eval_ep_sums_done=eval_ep_sums_done,
            eval_ep_count_done=eval_ep_count_done,
            eval_ep_len_done=eval_ep_len_done,
            curriculum_area=jnp.mean(env_state.curriculum.weights, axis=-1),
            envelope_exits=envelope_exits,
        )
        ts = TrainState(params=params, opt_state=opt_state,
                        adapt_opt_state=adapt_opt_state, lr=lr, rng=rng,
                        iteration=ts.iteration + 1)
        return env_state, obs_dict, ts, metrics

    return train_iteration
