"""Full-train-state checkpointing.

Unlike the reference, which checkpoints only the network state_dict and the
curriculum weights (reference: go1_gym_learn/ppo_cse/__init__.py:231-274,
76-91 — env and optimizer state are lost on resume), we checkpoint the
complete training state: params, both optimizer states, adaptive LR, env
state (including curriculum weights, DR params, RNG keys) — resume is
bit-exact.

Format: a pickle of numpy-ified pytrees (portable, no framework lock-in).

For SHARED-storage / multi-host checkpointing (a pod slice resuming from a
common directory — the analog of the reference Runner pulling weights and
curriculum state from its ml_logger server, reference
go1_gym_learn/ppo_cse/__init__.py:76-91), `save_shared`/`load_shared`
layer orbax on the same trees: every process writes its own shards of
cross-process global arrays (no allgather), restore reassembles them under
the live sharding, and the pickle path stays the dependency-light core for
single-host runs.  A directory path (no .pkl suffix) selects the orbax
format in Runner.save/load, so `--resume <shared-dir>` works across hosts.
"""
from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(path: str, tree) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(tree), f)
    os.replace(tmp, path)


def load(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def _shared_path(path: str) -> str:
    # absolutize LOCAL paths only — a scheme'd URL (gs://, s3://) must
    # pass through untouched or abspath would mangle it into a bogus
    # local directory
    return path if "://" in path else os.path.abspath(path)


def save_shared(path: str, tree) -> None:
    """Checkpoint to a shared-storage DIRECTORY via orbax.

    Works under jax.distributed: sharded global arrays are written
    distributedly (each process persists its addressable shards; orbax
    coordinates the commit), so no process ever needs the full array in
    host memory.  `path` may be any fsspec-able location orbax supports
    (shared filesystem here; gs:// etc. in a real pod deployment).

    Overwrite is crash-safe on local/shared filesystems: the new
    checkpoint is fully written NEXT TO the old one and swapped in by
    rename, so a preemption mid-save can never destroy the previous
    resume point (orbax's own force=True deletes the old dir before the
    new one is committed)."""
    import orbax.checkpoint as ocp

    path = _shared_path(path)
    ckptr = ocp.StandardCheckpointer()
    if "://" in path or not os.path.exists(path):
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return
    import shutil
    new = path + ".new"
    old = path + ".old"
    shutil.rmtree(new, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    ckptr.save(new, tree, force=True)
    ckptr.wait_until_finished()
    # only process 0 performs the swap (the others' saves have already
    # been committed into `new` by the collective save above)
    if jax.process_index() == 0:
        os.rename(path, old)
        os.rename(new, path)
        shutil.rmtree(old, ignore_errors=True)
    if jax.process_count() > 1:
        # don't let other processes observe the pre-swap directory state
        # (e.g. an immediate resume) before process 0's rename lands
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("wtw_shared_ckpt_swap")


def load_shared(path: str, template):
    """Restore a `save_shared` checkpoint into the template's structure.

    The template's leaves supply shape/dtype/sharding: restoring under a
    live mesh reassembles each process's shards of cross-process arrays.
    Structure or shape drift fails loudly inside orbax (same contract as
    restore_like)."""
    import orbax.checkpoint as ocp

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            tuple(x.shape), x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        template)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_shared_path(path), abstract)


def _keyed_leaves(tree):
    """{key-path string: leaf} via tree_flatten_with_path."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def restore_like(template, loaded, strict: bool = True):
    """Map loaded numpy arrays back onto the template pytree structure.

    Leaves are matched BY KEY PATH (not position), and every matched leaf
    must agree with the template in shape — a checkpoint written before a
    state field was added/removed/reshaped fails loudly (or, with
    strict=False, keeps the template value for missing keys and ignores
    extra keys, printing what was migrated) instead of silently
    misassigning arrays the way a count-only positional zip would.
    """
    import jax.numpy as jnp

    t_map = _keyed_leaves(template)
    l_map = _keyed_leaves(loaded)
    missing = sorted(set(t_map) - set(l_map))
    extra = sorted(set(l_map) - set(t_map))
    if strict and (missing or extra):
        raise ValueError(
            "checkpoint/template structure mismatch:\n"
            f"  keys only in template (added since save?): {missing[:8]}\n"
            f"  keys only in checkpoint (removed since save?): {extra[:8]}\n"
            "pass strict=False to keep template values for missing keys "
            "and drop extra ones")
    bad_shape = [
        (k, np.shape(l_map[k]), np.shape(t_map[k]))
        for k in t_map if k in l_map
        and np.shape(l_map[k]) != np.shape(t_map[k])]
    if bad_shape:
        raise ValueError(
            "checkpoint leaf shapes do not match the template "
            "(different num_envs / model?): "
            + "; ".join(f"{k}: ckpt{s} vs template{t}"
                        for k, s, t in bad_shape[:8]))
    if missing or extra:
        print(f"restore_like: migrating checkpoint — keeping template "
              f"values for {missing}, ignoring {extra}", flush=True)

    def pick(path, t_leaf):
        k = jax.tree_util.keystr(path)
        if k not in l_map:
            return t_leaf
        dtype = getattr(t_leaf, "dtype", None)
        return jnp.asarray(l_map[k], dtype=dtype)

    return jax.tree_util.tree_map_with_path(pick, template)
