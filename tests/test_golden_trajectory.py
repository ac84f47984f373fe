"""Golden-trajectory regression tests.

The 64-env zero-action protocol (the reference's scripts/test.py parity
config per BASELINE.json) replayed against recorded snapshots — catches
unintended physics/env behavior changes across refactors.  TWO goldens:

- `traj_64env_zero_actions.npz` — cold-start solver (guards the core
  16-iteration projected-Jacobi path with no warm-start seeding);
- `traj_64env_zero_actions_default.npz` — the SHIPPING configuration
  (mob_train_cfg defaults: megastep + warm-3 + cross-step warm start),
  so the path users actually run has drift protection too (round-3
  verdict item 3).

Regenerate deliberately when the physics is *intentionally* changed:

    python tests/test_golden_trajectory.py --regen

Golden provenance: recorded 2026-08-20 (round 4) after the solver rework
— row-decoupled friction rows (exact cone saturation), midpoint
velocity-product integration, 15/25 m/s / rad/s base velocity caps.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN_COLD = os.path.join(_DIR, "traj_64env_zero_actions.npz")
GOLDEN_DEFAULT = os.path.join(_DIR, "traj_64env_zero_actions_default.npz")
GOLDEN_XLA = os.path.join(_DIR, "traj_64env_zero_actions_xla.npz")


def _rollout(variant: str):
    from walk_these_ways_tpu.go1_config import mob_train_cfg
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv

    import dataclasses
    cfg = mob_train_cfg(num_envs=64)
    if variant != "default":
        # pin the cold-start contact solver: these variants guard the
        # core solver independent of warm-start seeding
        cfg = dataclasses.replace(cfg, sim=dataclasses.replace(
            cfg.sim, contact_warm_start=False,
            contact_cross_step_warm_start=False))
    if variant == "xla":
        # plain XLA engine path: seconds to compile on CPU — the FAST
        # tier's trajectory guard (the Pallas variants below compile for
        # minutes in interpret mode and run in the heavy tier)
        cfg = dataclasses.replace(cfg, sim=dataclasses.replace(
            cfg.sim, use_pallas_contact=False, megastep=False))
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


def _check(golden_path, variant):
    z = np.load(golden_path)
    pos, q, rew = _rollout(variant)
    # Tiered tolerances.  The test harness pins the CPU backend (conftest),
    # where the rollout is currently bit-exact vs the golden file; the
    # early-snapshot tier is tight enough to catch any real physics drift,
    # while the late tier leaves room for chaotic amplification of
    # fusion-level numeric changes across XLA releases.
    early = slice(0, 5)   # snapshots at steps 10..50
    late = slice(5, None)  # snapshots at steps 60..100
    np.testing.assert_allclose(pos[early], z["base_pos"][early], atol=1e-5)
    np.testing.assert_allclose(q[early], z["q"][early], atol=1e-5)
    np.testing.assert_allclose(rew[early], z["rew"][early], atol=1e-6)
    np.testing.assert_allclose(pos[late], z["base_pos"][late], atol=2e-3)
    np.testing.assert_allclose(q[late], z["q"][late], atol=5e-3)
    np.testing.assert_allclose(rew[late], z["rew"][late], atol=1e-3)


def test_matches_golden_trajectory_xla():
    _check(GOLDEN_XLA, "xla")


@pytest.mark.heavy
def test_matches_golden_trajectory():
    _check(GOLDEN_COLD, "cold")


@pytest.mark.heavy
def test_matches_golden_trajectory_default_config():
    _check(GOLDEN_DEFAULT, "default")


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        for path, variant in ((GOLDEN_COLD, "cold"),
                              (GOLDEN_DEFAULT, "default"),
                              (GOLDEN_XLA, "xla")):
            pos, q, rew = _rollout(variant)
            np.savez_compressed(path, base_pos=pos, q=q, rew=rew)
            print("regenerated", path)
