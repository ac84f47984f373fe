"""Env smoke test: small world, zero/scripted actions, 1000 steps.

Equivalent of reference scripts/test.py:14-206 (the install-verification and
step-parity reference config): a handful of envs with the full feature set
(actuator net, lag buffer, 15-dim gait commands, trimesh-style flat tiles),
stepped with zero actions while printing basic invariants.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_env(num_envs: int = 3, steps: int = 1000, seed: int = 0):
    import jax.numpy as jnp
    import numpy as np
    from walk_these_ways_tpu.go1_config import mob_train_cfg
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.envs.wrappers import VecEnvAdapter

    cfg = mob_train_cfg(num_envs=num_envs)
    env = VecEnvAdapter(LeggedRobotEnv(cfg), seed=seed)
    obs = env.reset()
    zero = jnp.zeros((num_envs, 12))
    t0 = time.time()
    for i in range(steps):
        obs, rew, done, info = env.step(zero)
        if (i + 1) % 200 == 0:
            z = np.asarray(env.state.phys.base_pos[:, 2])
            print(f"step {i+1:5d} | base z {z.mean():.3f} | "
                  f"rew {float(rew.mean()):.4f} | done {int(done.sum())}")
    dt = time.time() - t0
    print(f"{steps} steps x {num_envs} envs in {dt:.1f}s "
          f"({steps*num_envs/dt:,.0f} env-steps/s)")
    z = np.asarray(env.state.phys.base_pos[:, 2])
    assert np.isfinite(np.asarray(obs["obs"])).all(), "non-finite obs"
    print("OK")


def main():

    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=3)
    p.add_argument("--steps", type=int, default=1000)
    a = p.parse_args()
    run_env(a.num_envs, a.steps)


if __name__ == "__main__":
    main()
