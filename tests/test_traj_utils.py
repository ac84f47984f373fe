"""split_and_pad_trajectories / unpad / recurrent minibatches vs a
direct per-env oracle (reference go1_gym_learn/utils/utils.py:5-43
semantics: split each env's time series at dones, env-major trajectory
order, zero-pad, (T, M) validity masks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walk_these_ways_tpu.learn import traj_utils


def oracle_split(x, dones):
    """Per-env python split: returns (padded (T, M, F), masks (T, M))."""
    T, N = dones.shape
    trajs = []
    for n in range(N):
        d = dones[:, n].copy()
        d[-1] = True
        start = 0
        for t in range(T):
            if d[t]:
                trajs.append(x[start:t + 1, n])
                start = t + 1
    M = len(trajs)
    feat = x.shape[2:]
    padded = np.zeros((T, M) + feat, x.dtype)
    masks = np.zeros((T, M), bool)
    for m, tr in enumerate(trajs):
        padded[:len(tr), m] = tr
        masks[:len(tr), m] = True
    return padded, masks


def random_case(seed, T=11, N=5, F=3, p_done=0.25):
    rng = np.random.RandomState(seed)
    x = rng.randn(T, N, F).astype(np.float32)
    dones = rng.rand(T, N) < p_done
    return x, dones


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_split_matches_oracle(seed):
    x, dones = random_case(seed)
    want_padded, want_masks = oracle_split(x, dones)
    M = want_padded.shape[1]
    got_padded, got_masks = traj_utils.split_and_pad_trajectories(
        jnp.asarray(x), jnp.asarray(dones))
    assert got_padded.shape[1] == M
    np.testing.assert_array_equal(np.asarray(got_masks), want_masks)
    np.testing.assert_allclose(np.asarray(got_padded), want_padded)


def test_split_no_dones_is_identityish():
    x, _ = random_case(3)
    dones = np.zeros(x.shape[:2], bool)
    padded, masks = traj_utils.split_and_pad_trajectories(
        jnp.asarray(x), jnp.asarray(dones))
    # one full-length trajectory per env, env order preserved
    np.testing.assert_allclose(np.asarray(padded), x)
    assert bool(masks.all())


@pytest.mark.parametrize("seed", [0, 4])
def test_unpad_roundtrip(seed):
    x, dones = random_case(seed)
    padded, _ = traj_utils.split_and_pad_trajectories(
        jnp.asarray(x), jnp.asarray(dones))
    back = traj_utils.unpad_trajectories(padded, jnp.asarray(dones))
    np.testing.assert_allclose(np.asarray(back), x)


def test_split_under_jit_with_static_bound():
    x, dones = random_case(5)
    T, N = dones.shape

    @jax.jit
    def f(x, d):
        return traj_utils.split_and_pad_trajectories(
            x, d, max_num_trajs=T * N)

    padded, masks = f(jnp.asarray(x), jnp.asarray(dones))
    want_padded, want_masks = oracle_split(x, dones)
    M = want_padded.shape[1]
    np.testing.assert_allclose(np.asarray(padded[:, :M]), want_padded)
    np.testing.assert_array_equal(np.asarray(masks[:, :M]), want_masks)
    assert not bool(masks[:, M:].any())


def test_recurrent_minibatches_covers_batch():
    x, dones = random_case(6, T=8, N=6, F=2)
    acts = np.random.RandomState(7).randn(8, 6, 2).astype(np.float32)
    seen_envs = 0
    for mb in traj_utils.recurrent_minibatches(
            {"obs": jnp.asarray(x)}, {"actions": jnp.asarray(acts)},
            jnp.asarray(dones), num_mini_batches=2):
        # per-minibatch padded obs match the oracle on that env slice
        sl = slice(seen_envs, seen_envs + 3)
        want_padded, want_masks = oracle_split(x[:, sl], dones[:, sl])
        M = want_padded.shape[1]
        np.testing.assert_allclose(np.asarray(mb["obs"][:, :M]), want_padded)
        np.testing.assert_array_equal(np.asarray(mb["masks"][:, :M]),
                                      want_masks)
        np.testing.assert_allclose(np.asarray(mb["actions"]), acts[:, sl])
        seen_envs += 3
    assert seen_envs == 6
