"""On-device command curriculum.

TPU-native reformulation of the reference's CPU/NumPy
``RewardThresholdCurriculum`` (reference: go1_gym/envs/base/curriculum.py:
17-154).  The reference pulls episode sums to the host every resample
(legged_robot.py:719,734,757-760) — a sync point that would stall a TPU
program.  Here the whole thing lives on device:

- the 15-D command grid is dense and static: ``grid`` (B, 15) bin centroids,
  one weight row per gait category (pronk/trot/pace/bound), built exactly like
  ``Curriculum.__init__`` (linspace of centroids, curriculum.py:28-55);
- the neighborhood expansion of ``update`` (curriculum.py:123-154) becomes a
  static boolean adjacency matrix: bins are adjacent iff |centroid_d(i) -
  centroid_d(j)| <= local_range_d for every dimension d — precomputed once in
  numpy, applied as a masked matmul;
- sampling is a Gumbel-top-1 categorical over weights + uniform jitter within
  the chosen cell (matches ``sample_bins``/``sample_uniform_from_cell``,
  curriculum.py:67-89, in distribution).

Weight-update semantics preserved from curriculum.py:135-154: a successful
env bumps its own bin by +0.2 once (fancy-index assignment collapses
duplicates) and every adjacent bin by +0.2 per successful env, all clipped to
[0, 1] (positive increments make clip-at-end == clip-per-step).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CommandsCfg

# local_range used by the reference at the single update call site
# (legged_robot.py:737-739)
LOCAL_RANGE = np.array(
    [0.55, 0.55, 0.55, 0.55, 0.35, 0.25, 0.25, 0.25, 0.25, 1.0, 1.0, 1.0, 1.0,
     1.0, 1.0]
)

CATEGORY_NAMES = ("pronk", "trot", "pace", "bound")

# curriculum task-reward keys (legged_robot.py:728-729)
TASK_KEYS = (
    "tracking_lin_vel",
    "tracking_ang_vel",
    "tracking_contacts_shaped_force",
    "tracking_contacts_shaped_vel",
)


class CurriculumGrid(NamedTuple):
    """Static (numpy) curriculum geometry."""

    grid: np.ndarray        # (B, 15) bin centroids
    bin_sizes: np.ndarray   # (15,)
    adjacency: np.ndarray   # (B, B) float32 neighbor mask (includes self)
    num_bins: int


class CurriculumState(NamedTuple):
    weights: jnp.ndarray        # (C, B) in [0, 1]
    # On-device per-bin diagnostics — the TPU-native replacement for the
    # reference's host-side SlotCache running means and the
    # extras["curriculum/distribution"] pickle (reference:
    # go1_gym_learn/ppo/metrics_caches.py:49-78, legged_robot.py:229-232,
    # ppo_cse/__init__.py:193-202).  Monotonic accumulators; the runner
    # drains window deltas at log_freq, so no reset pass is needed on
    # device.
    bin_task_sums: jnp.ndarray  # (C, B, len(TASK_KEYS)) summed ep means
    bin_ep_counts: jnp.ndarray  # (C, B) episodes scored per bin


def make_grid(cfg: CommandsCfg) -> CurriculumGrid:
    counts = cfg.bin_counts
    lows = np.array(cfg.limits_low)
    highs = np.array(cfg.limits_high)
    axes = []
    bin_sizes = (highs - lows) / np.array(counts)
    for lo, hi, n, bs in zip(lows, highs, counts, bin_sizes):
        axes.append(np.linspace(lo + bs / 2, hi - bs / 2, n))
    mesh = np.meshgrid(*axes, indexing="ij")
    grid = np.stack([m.reshape(-1) for m in mesh], axis=-1)  # (B, 15)
    diff = np.abs(grid[:, None, :] - grid[None, :, :])       # (B, B, 15)
    adjacency = (diff <= LOCAL_RANGE[None, None, :]).all(axis=-1)
    return CurriculumGrid(
        grid=grid.astype(np.float32),
        bin_sizes=bin_sizes.astype(np.float32),
        adjacency=adjacency.astype(np.float32),
        num_bins=grid.shape[0],
    )


def init_state(cfg: CommandsCfg, grid: CurriculumGrid,
               num_categories: int = 4) -> CurriculumState:
    """Weights = 1 on bins inside the initial command ranges
    (``Curriculum.set_to``, curriculum.py:18-26)."""
    lo = np.array(cfg.ranges_low)
    hi = np.array(cfg.ranges_high)
    inside = ((grid.grid >= lo[None, :]) & (grid.grid <= hi[None, :])).all(axis=-1)
    w = np.tile(inside.astype(np.float32)[None, :], (num_categories, 1))
    B = grid.num_bins
    return CurriculumState(
        weights=jnp.asarray(w),
        bin_task_sums=jnp.zeros((num_categories, B, len(TASK_KEYS))),
        bin_ep_counts=jnp.zeros((num_categories, B)),
    )


def update(
    state: CurriculumState,
    grid: CurriculumGrid,
    update_mask: jnp.ndarray,      # (N,) envs whose episodes are being scored
    env_bins: jnp.ndarray,         # (N,) int32
    env_categories: jnp.ndarray,   # (N,) int32
    task_reward_means: jnp.ndarray,  # (N, len(TASK_KEYS)) command_sums / ep_len
    success_thresholds: jnp.ndarray,  # (len(TASK_KEYS),) threshold * dt-scale
) -> CurriculumState:
    """Vectorized RewardThresholdCurriculum.update (curriculum.py:135-154)."""
    C, B = state.weights.shape
    K = task_reward_means.shape[-1]
    success = jnp.all(task_reward_means > success_thresholds[None, :], axis=-1)
    success = success & update_mask                        # (N,)
    # All per-bin accumulations as ONE one-hot matmul instead of three
    # scatter-adds: TPU lowers duplicate-index scatters to a serialized
    # loop (~0.7 ms per scatter at N=4000 in the round-3 profile), while
    # the (N, C*B) one-hot contraction rides the MXU.
    flat_idx = env_categories * B + env_bins
    onehot = (flat_idx[:, None]
              == jnp.arange(C * B, dtype=flat_idx.dtype)[None, :]
              ).astype(jnp.float32)                        # (N, C*B)
    um = update_mask.astype(jnp.float32)
    rhs = jnp.concatenate(
        [success.astype(jnp.float32)[:, None],
         task_reward_means * um[:, None],
         um[:, None]], axis=1)                             # (N, K+2)
    acc = onehot.T @ rhs                                   # (C*B, K+2)
    counts = acc[:, 0].reshape(C, B)
    direct = (counts > 0).astype(jnp.float32)              # +0.2 once per bin
    adj = counts @ jnp.asarray(grid.adjacency)             # +0.2 per successful env
    new_w = jnp.clip(state.weights + 0.2 * direct + 0.2 * adj, 0.0, 1.0)
    # per-bin diagnostics: every scored episode contributes its task-reward
    # means and a count to its bin (SlotCache.log semantics, on device)
    task_sums = state.bin_task_sums + acc[:, 1:1 + K].reshape(C, B, K)
    ep_counts = state.bin_ep_counts + acc[:, 1 + K].reshape(C, B)
    return CurriculumState(weights=new_w, bin_task_sums=task_sums,
                           bin_ep_counts=ep_counts)


def sample(
    state: CurriculumState,
    grid: CurriculumGrid,
    rng: jax.Array,
    n: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample (commands, bins, categories) for n envs.

    Category ~ uniform over 4 (legged_robot.py:742-746); bin ~ categorical
    over that category's weights; command ~ uniform within the bin cell.

    The categorical is Gumbel-argmax over the weight row.  (Inverse-CDF
    via jnp.searchsorted was tried in round 3 and is ~14x SLOWER on TPU —
    the binary search lowers to 9-deep while loops of irregular gathers,
    57 ms/iter vs Gumbel's 4; the (n, B) materialization is the cheap
    option here.)
    """
    k_cat, k_bin, k_cell = jax.random.split(rng, 3)
    C, B = state.weights.shape
    cats = jax.random.randint(k_cat, (n,), 0, C)
    logw = jnp.log(jnp.maximum(state.weights, 1e-12))      # (C, B)
    g = jax.random.gumbel(k_bin, (n, B))
    bins = jnp.argmax(logw[cats] + g, axis=-1)             # (n,)
    centroids = jnp.asarray(grid.grid)[bins]               # (n, 15)
    jitter = jax.random.uniform(
        k_cell, (n, grid.grid.shape[1]), minval=-0.5, maxval=0.5
    )
    cmds = centroids + jitter * jnp.asarray(grid.bin_sizes)[None, :]
    return cmds, bins.astype(jnp.int32), cats.astype(jnp.int32)


# -- generic curriculum grids (reference Curriculum / SumCurriculum) --------

class GenericGrid(NamedTuple):
    """Static geometry of a generic binned curriculum built from
    ``key=(low, high, num_bins)`` ranges — the reference's base
    ``Curriculum.__init__`` (curriculum.py:28-55), minus the host RNG."""

    grid: np.ndarray       # (B, K) bin centroids
    bin_sizes: np.ndarray  # (K,)
    counts: Tuple[int, ...]
    keys: Tuple[str, ...]


def make_generic_grid(**key_ranges) -> GenericGrid:
    axes, sizes, counts = [], [], []
    for lo, hi, n in key_ranges.values():
        bs = (hi - lo) / n
        axes.append(np.linspace(lo + bs / 2, hi - bs / 2, n))
        sizes.append(bs)
        counts.append(n)
    mesh = np.meshgrid(*axes, indexing="ij")
    grid = np.stack([m.reshape(-1) for m in mesh], axis=-1)
    return GenericGrid(grid=grid.astype(np.float32),
                       bin_sizes=np.array(sizes, np.float32),
                       counts=tuple(counts),
                       keys=tuple(key_ranges.keys()))


def sample_generic(weights: jnp.ndarray, grid: GenericGrid, rng: jax.Array,
                   n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted bin choice + uniform jitter within the cell — the base
    ``Curriculum.sample`` (curriculum.py:67-89).  Returns (values, bins)."""
    k_bin, k_cell = jax.random.split(rng)
    logw = jnp.log(jnp.maximum(weights, 1e-12))
    g = jax.random.gumbel(k_bin, (n, weights.shape[0]))
    bins = jnp.argmax(logw[None, :] + g, axis=-1)
    centroids = jnp.asarray(grid.grid)[bins]
    jitter = jax.random.uniform(k_cell, (n, grid.grid.shape[1]),
                                minval=-0.5, maxval=0.5)
    return centroids + jitter * jnp.asarray(grid.bin_sizes)[None, :], \
        bins.astype(jnp.int32)


class SumCurriculumState(NamedTuple):
    """On-device success/trial accumulators per bin — the reference
    ``SumCurriculum`` (curriculum.py:90-111) without the host round trip."""

    success: jnp.ndarray  # (B,)
    trials: jnp.ndarray   # (B,)


def sum_init(grid: GenericGrid) -> SumCurriculumState:
    B = grid.grid.shape[0]
    return SumCurriculumState(success=jnp.zeros(B), trials=jnp.zeros(B))


def sum_update(state: SumCurriculumState, bin_inds: jnp.ndarray,
               l1_error: jnp.ndarray,
               threshold: float) -> SumCurriculumState:
    """curriculum.py:97-101: a trial per scored env, a success where the
    error beats the threshold (scatter-add collapses duplicate bins)."""
    ok = (l1_error < threshold).astype(jnp.float32)
    return SumCurriculumState(
        success=state.success.at[bin_inds].add(ok),
        trials=state.trials.at[bin_inds].add(1.0))


def success_rates(state: SumCurriculumState, grid: GenericGrid,
                  *keys: str) -> jnp.ndarray:
    """Success rate marginalized onto the named keys
    (curriculum.py:103-110): mean over every other grid dimension."""
    rate = (state.success / (state.trials + 1e-6)).reshape(grid.counts)
    marginals = tuple(i for i, k in enumerate(grid.keys) if k not in keys)
    if marginals:
        rate = rate.mean(axis=marginals)
    return rate


def postprocess_gaitwise(cmds: jnp.ndarray, cats: jnp.ndarray,
                         cfg: CommandsCfg) -> jnp.ndarray:
    """Per-gait phase/offset/bound mapping (legged_robot.py:763-820)."""
    c5, c6, c7 = cmds[:, 5], cmds[:, 6], cmds[:, 7]
    if cfg.gaitwise_curricula:
        pronk = cats == 0
        trot = cats == 1
        pace = cats == 2
        bound = cats == 3
        c5 = jnp.where(pronk, (c5 / 2 - 0.25) % 1, c5)
        c6 = jnp.where(pronk, (c6 / 2 - 0.25) % 1, c6)
        c7 = jnp.where(pronk, (c7 / 2 - 0.25) % 1, c7)
        c5 = jnp.where(trot, cmds[:, 5] / 2 + 0.25, c5)
        c6 = jnp.where(trot, 0.0, c6)
        c7 = jnp.where(trot, 0.0, c7)
        c5 = jnp.where(pace, 0.0, c5)
        c6 = jnp.where(pace, cmds[:, 6] / 2 + 0.25, c6)
        c7 = jnp.where(pace, 0.0, c7)
        c5 = jnp.where(bound, 0.0, c5)
        c6 = jnp.where(bound, 0.0, c6)
        c7 = jnp.where(bound, cmds[:, 7] / 2 + 0.25, c7)
    if cfg.binary_phases:
        # torch.round is round-half-to-even, same as jnp.round
        c5 = jnp.round(2 * c5) / 2.0 % 1
        c6 = jnp.round(2 * c6) / 2.0 % 1
        c7 = jnp.round(2 * c7) / 2.0 % 1
    cmds = cmds.at[:, 5].set(c5).at[:, 6].set(c6).at[:, 7].set(c7)
    # zero out small planar velocity commands (legged_robot.py:820)
    small = jnp.linalg.norm(cmds[:, :2], axis=-1) <= 0.2
    cmds = cmds.at[:, :2].multiply(jnp.where(small, 0.0, 1.0)[:, None])
    return cmds
