"""Policy evaluation across domain-randomization sweeps.

Equivalent of the reference's eval_metrics flow (reference:
go1_gym_learn/eval_metrics/metrics.py METRICS_FNS applied over
domain_randomization.py DR_SETTINGS): loads an exported policy, runs it
under each DR preset, and reports tracking RMSD / power / cost-of-transport
per setting.

Usage: python scripts/evaluate.py --policy <policy_latest.npz> \
           [--settings rand_regular static_medium] [--steps 250]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(policy_path: str, settings, steps: int, num_envs: int, seed: int):
    import jax
    import numpy as np
    from dataclasses import replace
    from walk_these_ways_tpu.go1_config import mob_train_cfg
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.learn.eval_metrics import (
        DR_SETTINGS, evaluate_policy)
    from walk_these_ways_tpu.models import actor_critic as ac
    from scripts.play import load_policy  # noqa: F401 (same npz layout)

    # rebuild ACParams from the flat npz for eval_metrics' adaptation_loss
    import numpy as np
    z = np.load(policy_path)
    import jax.numpy as jnp

    def mlp(prefix, n):
        return ac.MLPParams(
            weights=tuple(jnp.asarray(z[f"{prefix}/w{i}"]) for i in range(n)),
            biases=tuple(jnp.asarray(z[f"{prefix}/b{i}"]) for i in range(n)))

    params = ac.ACParams(adaptation=mlp("adaptation", 3), actor=mlp("actor", 4),
                         critic=mlp("actor", 4),  # critic unused in eval
                         std=jnp.asarray(z["std"]))

    results = {}
    for name in settings:
        cfg = mob_train_cfg(num_envs=num_envs)
        cfg = replace(cfg, domain_rand=DR_SETTINGS[name])
        env = LeggedRobotEnv(cfg)
        out = evaluate_policy(env, params, jax.random.PRNGKey(seed),
                              num_steps=steps)
        results[name] = out
        row = " | ".join(f"{k}={v:.4f}" for k, v in out.items())
        print(f"{name:15s} {row}", flush=True)
    return results


def main():

    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", default="runs/latest/checkpoints/policy_latest.npz")
    ap.add_argument("--settings", nargs="+",
                    default=["rand_regular", "static_medium"])
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--num-envs", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    evaluate(a.policy, a.settings, a.steps, a.num_envs, a.seed)


if __name__ == "__main__":
    main()
