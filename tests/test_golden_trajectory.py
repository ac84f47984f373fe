"""Golden-trajectory regression test.

The 64-env zero-action protocol (the reference's scripts/test.py parity
config per BASELINE.json) replayed against a recorded snapshot — catches
unintended physics/env behavior changes across refactors.  Regenerate the
golden file deliberately when the physics is *intentionally* changed:

    python tests/test_golden_trajectory.py --regen
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "traj_64env_zero_actions.npz")


def _rollout():
    from walk_these_ways_tpu.go1_config import mob_train_cfg
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv

    cfg = mob_train_cfg(num_envs=64)
    env = LeggedRobotEnv(cfg)
    state, obs = env.reset(jax.random.PRNGKey(1234))
    step = jax.jit(env.step)
    zeros = jnp.zeros((64, 12))
    snap_pos, snap_q, snap_rew = [], [], []
    for i in range(100):
        state, obs, rew, done, info = step(state, zeros)
        if (i + 1) % 10 == 0:
            snap_pos.append(np.asarray(state.phys.base_pos))
            snap_q.append(np.asarray(state.phys.q))
            snap_rew.append(np.asarray(rew))
    return np.stack(snap_pos), np.stack(snap_q), np.stack(snap_rew)


def test_matches_golden_trajectory():
    z = np.load(GOLDEN)
    pos, q, rew = _rollout()
    # loose tolerances: platform/fusion differences accumulate over 100 steps
    np.testing.assert_allclose(pos, z["base_pos"], atol=5e-2)
    np.testing.assert_allclose(q, z["q"], atol=1e-1)
    np.testing.assert_allclose(rew, z["rew"], atol=1e-2)


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        pos, q, rew = _rollout()
        np.savez_compressed(GOLDEN, base_pos=pos, q=q, rew=rew)
        print("regenerated", GOLDEN)
