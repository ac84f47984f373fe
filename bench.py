"""Headline benchmark: full-config training throughput at 4000 envs.

Measures end-to-end env-steps/s of the complete training loop (physics x4
decimation + actuator net + MoB rewards + DR + curriculum + PPO/adaptation
update — the `scripts/train.py` configuration of the reference) on one chip.

Baseline: the reference publishes no benchmark numbers (BASELINE.md).  We
use 60,000 env-steps/s as the assumed IsaacGym-on-A100 figure for this
workload (4000 envs, actuator net, 30-step obs history; legged-gym-family
stacks report ~50-100k env-steps/s on A100 for comparable quadruped tasks,
with walk-these-ways at the heavier end of per-step work).  vs_baseline is
measured/60000 — the north-star target is >= 5.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# the config call, not the env var: the container sitecustomize imports
# jax before this module runs, so env-var config is already frozen
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(num_envs: int = 4000, warmup: int = 3, iters: int = 20,
         terrain: str = "flat"):
    from walk_these_ways_tpu.go1_config import mob_train_cfg, rough_train_cfg
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.learn import ppo as ppo_mod

    cfg_fn = rough_train_cfg if terrain == "rough" else mob_train_cfg
    cfg = cfg_fn(num_envs=num_envs)
    env = LeggedRobotEnv(cfg)
    rng = jax.random.PRNGKey(0)
    ts = ppo_mod.init_train_state(rng, env)
    env_state, obs_dict = env.reset(jax.random.PRNGKey(1),
                                    random_episode_lengths=True)
    num_steps = 24
    train_iter = jax.jit(ppo_mod.make_train_iteration(env, num_steps=num_steps))

    for _ in range(warmup):
        env_state, obs_dict, ts, metrics = train_iter(env_state, obs_dict, ts)
    # block on the FULL result tree: blocking on a single leaf has been
    # observed to return before the chain finished executing under the
    # axon runtime, inflating the measurement ~100x
    jax.block_until_ready((env_state, ts, metrics))

    t0 = time.perf_counter()
    for _ in range(iters):
        env_state, obs_dict, ts, metrics = train_iter(env_state, obs_dict, ts)
    jax.block_until_ready((env_state, ts, metrics))
    dt = time.perf_counter() - t0

    steps_per_s = iters * num_steps * num_envs / dt
    baseline = 60000.0
    suffix = "" if terrain == "flat" else f"_{terrain}"
    print(json.dumps({
        "metric": f"train_env_steps_per_s_4000env{suffix}",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / baseline, 3),
    }), flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("num_envs", type=int, nargs="?", default=4000)
    ap.add_argument("--terrain", choices=["flat", "rough"], default="flat")
    a = ap.parse_args()
    # one retry: the TPU tunnel occasionally drops a dispatch when another
    # process contended for the chip moments earlier; a failed attempt
    # poisons its buffers, a fresh attempt recovers
    try:
        main(num_envs=a.num_envs, terrain=a.terrain)
    except Exception as e:  # noqa: BLE001
        print(f"bench attempt 1 failed ({type(e).__name__}); retrying",
              file=sys.stderr, flush=True)
        main(num_envs=a.num_envs, terrain=a.terrain)
