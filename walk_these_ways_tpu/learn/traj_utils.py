"""Trajectory split/pad utilities for recurrent policies.

TPU-native rebuild of the reference's RNN-path helpers (reference:
go1_gym_learn/utils/utils.py:5-43 `split_and_pad_trajectories` /
`unpad_trajectories`, consumed by the recurrent minibatch generator at
go1_gym_learn/ppo_cse/rollout_storage.py:142-180 — unused by the default
MoB config in both stacks, but part of the trainer's public surface).

The reference implementation is host-side torch with data-dependent
shapes (`torch.split` on trajectory lengths + `pad_sequence`).  A TPU
program needs static shapes, so the split is reformulated as pure
index arithmetic + one scatter:

- segment id per (t, env)   = exclusive cumsum of dones down the column
- trajectory id             = env-major base offset + segment id
- position inside segment   = t - (last done index before t + 1)
- padded output             = zeros.at[pos, traj].set(x)   (one scatter)
- valid mask                = zeros.at[pos, traj].set(True)

which jits cleanly with a static `max_num_trajs` bound (every env
contributes at least one trajectory and one extra per done, so
`N + sum(dones)` bounds it; `T * N` is the universal static bound).
Trajectory ordering matches the reference exactly: env-major, in time
order within each env (utils.py:24-32 flattens env-major before
splitting).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _traj_indices(dones):
    """(T, N) dones -> (traj_idx, pos, num_trajs) with the reference's
    env-major trajectory ordering.  The final step is always treated as a
    trajectory end (utils.py:22-23 `dones[-1] = 1`)."""
    T, N = dones.shape
    d = dones.astype(jnp.int32)
    d = d.at[-1, :].set(1)
    # segment id = number of dones strictly before t in this column
    seg = jnp.cumsum(d, axis=0) - d
    counts = seg[-1, :] + 1                       # trajectories per env
    base = jnp.cumsum(counts) - counts            # exclusive env-major base
    traj_idx = base[None, :] + seg                # (T, N)
    # start of the current segment = (last done index before t) + 1,
    # computed as a running maximum of (t+1) at done rows
    t_col = jnp.arange(T, dtype=jnp.int32)[:, None]
    done_pos = jnp.where(d > 0, t_col + 1, 0)
    start = jnp.concatenate(
        [jnp.zeros((1, N), jnp.int32),
         jax.lax.cummax(done_pos, axis=0)[:-1]], axis=0)
    pos = t_col - start                           # (T, N)
    return traj_idx, pos, jnp.sum(counts)


def split_and_pad_trajectories(x, dones, max_num_trajs: int | None = None):
    """Split (T, N, ...) at dones into zero-padded (T, M, ...) trajectories
    plus a (T, M) validity mask (reference utils.py:5-37).

    `max_num_trajs` is the static M; defaults to the true count when the
    inputs are concrete (outside jit) and must be supplied under jit
    (T * N is the universal bound; N + dones.sum() is tight).
    Rows past a trajectory's length are zero / False, so the result is the
    reference's `pad_sequence` output padded out to T rows.
    """
    T, N = dones.shape[:2]
    dones = dones.reshape(T, N)
    traj_idx, pos, num = _traj_indices(dones)
    if max_num_trajs is None:
        try:
            max_num_trajs = int(num)
        except jax.errors.ConcretizationTypeError as e:
            raise ValueError(
                "split_and_pad_trajectories needs a static max_num_trajs "
                "under jit (T * N always bounds it)") from e
    M = max_num_trajs
    flat_t = pos.reshape(-1)
    flat_m = traj_idx.reshape(-1)
    feat = x.shape[2:]
    padded = jnp.zeros((T, M) + feat, x.dtype).at[flat_t, flat_m].set(
        x.reshape((T * N,) + feat), mode="drop")
    masks = jnp.zeros((T, M), bool).at[flat_t, flat_m].set(
        True, mode="drop")
    return padded, masks


def unpad_trajectories(padded, dones):
    """Inverse of split_and_pad_trajectories: gather (T, M, ...) padded
    trajectories back to (T, N, ...) env-major time series (reference
    utils.py:39-43 — theirs takes the masks; the (t, env) -> (pos, traj)
    map is recomputed from dones here, which is the same information)."""
    T, N = dones.shape[:2]
    traj_idx, pos, _ = _traj_indices(dones.reshape(T, N))
    return padded[pos.reshape(-1), traj_idx.reshape(-1)].reshape(
        (T, N) + padded.shape[2:])


def recurrent_minibatches(traj_fields, seq_fields, dones, num_mini_batches,
                          max_num_trajs: int | None = None):
    """Yield RNN-style minibatches (reference rollout_storage.py:142-180
    `reccurent_mini_batch_generator`, one epoch): envs are split into
    `num_mini_batches` contiguous groups; `traj_fields` entries come back
    split-and-padded per trajectory with a shared validity mask, and
    `seq_fields` entries come back as raw (T, env-slice) sequences.

    Yields dicts {name: array} + key "masks".  Host-side generator (like
    the reference's); each yielded array is a device array.
    """
    T, N = dones.shape[:2]
    dones = dones.reshape(T, N)
    mb = N // num_mini_batches
    for i in range(num_mini_batches):
        sl = slice(i * mb, (i + 1) * mb)
        d = dones[:, sl]
        out = {}
        masks = None
        for name, x in traj_fields.items():
            padded, masks = split_and_pad_trajectories(
                x[:, sl], d, max_num_trajs=max_num_trajs)
            out[name] = padded
        for name, x in seq_fields.items():
            out[name] = x[:, sl]
        out["masks"] = masks
        yield out
