"""Profile the jitted train iteration on the real TPU and print the
top-k ops by self time (XLA op-level breakdown from the xplane trace).

This is the profiling loop the perf work runs on (uses
utils/profiling.trace around the hot section).

Usage: python scripts/profile_train.py [--num-envs 4000] [--iters 10]
           [--rollout-only] [--mode reuse|exact]
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def print_top_ops(logdir: str):
    """Self-time breakdown via scripts/parse_trace_self.py."""
    import subprocess
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "parse_trace_self.py"), logdir])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rollout-only", action="store_true")
    ap.add_argument("--mode", default="reuse", choices=["reuse", "exact"])
    ap.add_argument("--terrain", default="flat", choices=["flat", "rough"])
    ap.add_argument("--out", default="/tmp/jax_trace")
    a = ap.parse_args()

    import dataclasses
    import time

    import jax
    import jax.numpy as jnp

    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.go1_config import mob_train_cfg, rough_train_cfg
    from walk_these_ways_tpu.learn import ppo as ppo_mod

    cfg_fn = rough_train_cfg if a.terrain == "rough" else mob_train_cfg
    cfg = cfg_fn(num_envs=a.num_envs)
    if a.mode == "exact":
        cfg = dataclasses.replace(
            cfg, sim=dataclasses.replace(cfg.sim, reuse_matrices=False))
    env = LeggedRobotEnv(cfg)

    if a.rollout_only:
        actions = jnp.zeros((a.num_envs, 12))

        @jax.jit
        def run(state):
            def body(s, _):
                s, _, _, _, _ = env.step(s, actions)
                return s, None
            state, _ = jax.lax.scan(body, state, None, length=24)
            return state

        state, _ = env.reset(jax.random.PRNGKey(0))
        state = run(state)          # compile
        jax.block_until_ready(state)
        t0 = time.time()
        for _ in range(a.iters):
            state = run(state)
        jax.block_until_ready(state)
        dt = (time.time() - t0) / a.iters
        print(f"rollout-only: {24 * a.num_envs / dt:,.0f} env-steps/s "
              f"({dt*1e3:.1f} ms / 24 steps)")
        with jax.profiler.trace(a.out):
            for _ in range(3):
                state = run(state)
            jax.block_until_ready(state)
    else:
        ts = ppo_mod.init_train_state(jax.random.PRNGKey(0), env)
        it_fn = jax.jit(ppo_mod.make_train_iteration(env, num_steps=24))
        es, obs = env.reset(jax.random.PRNGKey(1))
        es, obs, ts, _ = it_fn(es, obs, ts)   # compile
        jax.block_until_ready(ts.params)
        t0 = time.time()
        for _ in range(a.iters):
            es, obs, ts, m = it_fn(es, obs, ts)
        jax.block_until_ready(ts.params)
        dt = (time.time() - t0) / a.iters
        print(f"full train iteration: {24 * a.num_envs / dt:,.0f} env-steps/s "
              f"({dt*1e3:.1f} ms / iter)")
        with jax.profiler.trace(a.out):
            for _ in range(3):
                es, obs, ts, m = it_fn(es, obs, ts)
            jax.block_until_ready(ts.params)

    print_top_ops(a.out)


if __name__ == "__main__":
    main()
