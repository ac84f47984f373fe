"""Curriculum tests against the reference semantics
(go1_gym/envs/base/curriculum.py inline asserts + update behavior)."""
import jax
import jax.numpy as jnp
import numpy as np

from walk_these_ways_tpu.envs import curriculum as curr
from walk_these_ways_tpu.go1_config import mob_train_cfg


def _grid():
    cfg = mob_train_cfg(num_envs=4).commands
    return cfg, curr.make_grid(cfg)


def test_grid_shape():
    cfg, grid = _grid()
    # train config: 21 x-vel bins x 21 yaw bins x 1-bin everything else
    assert grid.num_bins == 21 * 21
    assert grid.grid.shape == (441, 15)
    # centroids live inside limits
    assert (grid.grid[:, 0] >= -5).all() and (grid.grid[:, 0] <= 5).all()


def test_initial_weights_inside_command_range():
    cfg, grid = _grid()
    st = curr.init_state(cfg, grid)
    assert st.weights.shape == (4, 441)
    on = np.asarray(st.weights[0]) > 0
    # bins with |vx| <= 1 and |vyaw| <= 1 start enabled
    inside = (np.abs(grid.grid[:, 0]) <= 1.0) & (np.abs(grid.grid[:, 2]) <= 1.0)
    np.testing.assert_array_equal(on, inside)


def test_update_expands_weights():
    cfg, grid = _grid()
    st = curr.init_state(cfg, grid)
    w0 = np.asarray(st.weights).copy()
    # one successful env in category 1, bin = center of the grid
    center_bin = int(np.argmin(np.linalg.norm(grid.grid[:, [0, 2]], axis=1)))
    n = 4
    st2 = curr.update(
        st, grid,
        update_mask=jnp.array([True, False, False, False]),
        env_bins=jnp.full((n,), center_bin, jnp.int32),
        env_categories=jnp.ones((n,), jnp.int32),
        task_reward_means=jnp.full((n, 4), 10.0),
        success_thresholds=jnp.ones(4),
    )
    w2 = np.asarray(st2.weights)
    # category 1 grew, others untouched
    assert w2[1].sum() >= w0[1].sum()
    np.testing.assert_array_equal(w2[0], w0[0])
    # the successful bin itself got direct + self-adjacent bumps (clipped at 1)
    assert w2[1, center_bin] == 1.0
    # neighbors within local_range got +0.2
    neigh = np.nonzero(grid.adjacency[center_bin])[0]
    assert (w2[1, neigh] >= np.clip(w0[1, neigh] + 0.2, 0, 1) - 1e-6).all()


def test_update_failure_no_change():
    cfg, grid = _grid()
    st = curr.init_state(cfg, grid)
    st2 = curr.update(
        st, grid,
        update_mask=jnp.ones(4, bool),
        env_bins=jnp.zeros(4, jnp.int32),
        env_categories=jnp.zeros(4, jnp.int32),
        task_reward_means=jnp.zeros((4, 4)),   # below threshold
        success_thresholds=jnp.ones(4),
    )
    np.testing.assert_array_equal(np.asarray(st2.weights),
                                  np.asarray(st.weights))


def test_bin_diagnostics_accumulate():
    """Per-bin episode diagnostics (the on-device SlotCache replacement)
    accumulate task-reward means and counts only for scored envs."""
    cfg, grid = _grid()
    st = curr.init_state(cfg, grid)
    assert st.bin_task_sums.shape == (4, 441, 4)
    n = 4
    tr = jnp.tile(jnp.asarray([1.0, 2.0, 3.0, 4.0])[None, :], (n, 1))
    st2 = curr.update(
        st, grid,
        update_mask=jnp.array([True, True, False, False]),
        env_bins=jnp.asarray([7, 7, 7, 9], jnp.int32),
        env_categories=jnp.asarray([2, 2, 2, 0], jnp.int32),
        task_reward_means=tr,
        success_thresholds=jnp.full(4, 100.0),  # no weight growth
    )
    counts = np.asarray(st2.bin_ep_counts)
    assert counts[2, 7] == 2.0          # two scored envs in (cat 2, bin 7)
    assert counts.sum() == 2.0          # unscored envs contribute nothing
    np.testing.assert_allclose(
        np.asarray(st2.bin_task_sums)[2, 7], [2.0, 4.0, 6.0, 8.0])


def test_sampling_respects_weights():
    cfg, grid = _grid()
    st = curr.init_state(cfg, grid)
    cmds, bins, cats = curr.sample(st, grid, jax.random.PRNGKey(0), 2000)
    w = np.asarray(st.weights)
    # every sampled bin must have positive weight in its category
    assert (w[np.asarray(cats), np.asarray(bins)] > 0).all()
    # sampled commands stay inside initial command ranges +- half bin
    assert (np.abs(np.asarray(cmds)[:, 0]) <= 1.0 + grid.bin_sizes[0]).all()
    # all four categories appear
    assert len(np.unique(np.asarray(cats))) == 4


def test_gaitwise_postprocess():
    cfg, grid = _grid()
    n = 8
    cmds = jnp.tile(jnp.linspace(0.1, 0.9, 15)[None, :], (n, 1))
    cmds = cmds.at[:, 0].set(1.0)  # keep vel above the zero-out threshold
    cats = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
    out = np.asarray(curr.postprocess_gaitwise(cmds, cats, cfg))
    # trot: offsets/bounds zero, phase in {0, 0.5} after binary rounding
    assert out[1, 6] == 0 and out[1, 7] == 0
    assert out[1, 5] in (0.0, 0.5)
    # pace: phase/bound zero
    assert out[2, 5] == 0 and out[2, 7] == 0
    # bound: phase/offset zero
    assert out[3, 5] == 0 and out[3, 6] == 0


# -- generic grid + SumCurriculum (reference curriculum.py:17-111) -----------

def test_generic_grid_and_sampling():
    g = curr.make_generic_grid(x=(-1.0, 1.0, 5), y=(-1.0, 1.0, 2),
                               z=(-1.0, 1.0, 11))
    # same grid shape assert as the reference __main__ check
    # (curriculum.py:163-164)
    assert g.grid.shape == (5 * 2 * 11, 3)
    assert g.counts == (5, 2, 11)
    w = jnp.ones(g.grid.shape[0])
    vals, bins = curr.sample_generic(w, g, jax.random.PRNGKey(0), 500)
    assert vals.shape == (500, 3) and bins.shape == (500,)
    # samples stay inside the overall range
    assert (np.abs(np.asarray(vals)) <= 1.0 + 1e-6).all()
    # weighted sampling: zeroing all but bin 0 collapses the choice
    w0 = jnp.zeros_like(w).at[0].set(1.0)
    _, bins0 = curr.sample_generic(w0, g, jax.random.PRNGKey(1), 100)
    assert (np.asarray(bins0) == 0).all()


def test_sum_curriculum_success_rates():
    g = curr.make_generic_grid(x=(-1.0, 1.0, 4), y=(0.0, 1.0, 3))
    st = curr.sum_init(g)
    bins = jnp.array([0, 0, 5, 11])
    err = jnp.array([0.1, 0.9, 0.2, 0.4])
    st = curr.sum_update(st, bins, err, threshold=0.5)
    s, t = np.asarray(st.success), np.asarray(st.trials)
    # bin 0: two trials, one success (0.1 < 0.5 <= 0.9)
    assert t[0] == 2 and s[0] == 1
    assert t[5] == 1 and s[5] == 1
    assert t[11] == 1 and s[11] == 1
    full = curr.success_rates(st, g, "x", "y")
    assert full.shape == (4, 3)
    marg_x = curr.success_rates(st, g, "x")
    assert marg_x.shape == (4,)
    # keyless: scalar overall mean
    overall = curr.success_rates(st, g)
    assert overall.shape == ()
