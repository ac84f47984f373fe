"""Shared-storage (orbax) checkpoint layer: utils/checkpoint.save_shared /
load_shared — the single-process semantics.  (The true multi-process
shards-from-every-host path is validated by the heavy-tier
tests/test_multihost.py::test_shared_storage_checkpoint_resume_bit_exact.)

Reference context: the reference Runner resumes weights + curriculum from
an ml_logger server (go1_gym_learn/ppo_cse/__init__.py:76-91); this is the
pod-slice-safe analog.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walk_these_ways_tpu.utils import checkpoint as ckpt


def _tree():
    return {
        "params": {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
                   "b": jnp.ones((4,), jnp.bfloat16)},
        "step": jnp.asarray(7, jnp.int32),
        "rng": jax.random.PRNGKey(3),
    }


def test_save_shared_roundtrip_bit_exact(tmp_path):
    path = str(tmp_path / "ckpt")
    tree = _tree()
    ckpt.save_shared(path, tree)
    back = ckpt.load_shared(path, jax.tree.map(lambda x: jnp.zeros_like(x),
                                               tree))
    la, sa = jax.tree_util.tree_flatten(tree)
    lb, sb = jax.tree_util.tree_flatten(back)
    assert sa == sb
    for a, b in zip(la, lb):
        assert a.dtype == b.dtype
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_save_shared_overwrites(tmp_path):
    path = str(tmp_path / "ckpt")
    tree = _tree()
    ckpt.save_shared(path, tree)
    tree2 = jax.tree.map(lambda x: x + 1 if x.dtype != jnp.uint32 else x,
                         tree)
    ckpt.save_shared(path, tree2)  # force=True semantics: latest wins
    back = ckpt.load_shared(path, tree)
    assert np.array_equal(np.asarray(back["params"]["w"]),
                          np.asarray(tree2["params"]["w"]))


def test_runner_shared_dir_save_resume_bit_exact(tmp_path):
    """Runner.save/load dispatch on a DIRECTORY path (orbax shared
    format): a fresh Runner resumed from the shared dir carries the
    exact same params/env state as the saver (the single-process leg of
    the --shared-ckpt / --resume <dir> flow; the cross-process leg is
    tests/test_multihost.py::test_shared_storage_checkpoint_resume_bit_exact)."""
    from conftest import xla_physics
    from walk_these_ways_tpu.envs.go1_env import LeggedRobotEnv
    from walk_these_ways_tpu.go1_config import mob_train_cfg
    from walk_these_ways_tpu.learn.runner import Runner, RunnerArgs

    # xla_physics: keep interpret-mode Pallas compiles out of the fast tier
    cfg = xla_physics(mob_train_cfg(num_envs=8))
    env = LeggedRobotEnv(cfg)
    shared = str(tmp_path / "shared_ckpt")
    r1 = Runner(env, log_dir=str(tmp_path / "runA"), seed=3,
                args=RunnerArgs(max_iterations=1, log_freq=1,
                                save_interval=1000))
    r1.learn(num_learning_iterations=1)
    r1.save(shared)

    r2 = Runner(env, log_dir=str(tmp_path / "runB"), seed=99,
                args=RunnerArgs(max_iterations=1, log_freq=1,
                                save_interval=1000, resume=True,
                                resume_path=shared))
    for a, b in zip(jax.tree.leaves(r1.train_state),
                    jax.tree.leaves(r2.train_state)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(r1.env_state),
                    jax.tree.leaves(r2.env_state)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_load_shared_shape_drift_fails(tmp_path):
    path = str(tmp_path / "ckpt")
    ckpt.save_shared(path, _tree())
    bad = _tree()
    bad["params"]["w"] = jnp.zeros((5, 4), jnp.float32)
    with pytest.raises(Exception):
        ckpt.load_shared(path, bad)
