"""Full-train-state checkpointing.

Unlike the reference, which checkpoints only the network state_dict and the
curriculum weights (reference: go1_gym_learn/ppo_cse/__init__.py:231-274,
76-91 — env and optimizer state are lost on resume), we checkpoint the
complete training state: params, both optimizer states, adaptive LR, env
state (including curriculum weights, DR params, RNG keys) — resume is
bit-exact.

Format: a pickle of numpy-ified pytrees (portable, no framework lock-in).
Orbax is available in the image and can be layered on for async multi-host
checkpointing later; this module is the dependency-light core.
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


def restore_like(template, loaded):
    """Map loaded numpy arrays back onto the template pytree structure."""
    flat_t, treedef = jax.tree.flatten(template)
    flat_l = jax.tree.leaves(loaded)
    assert len(flat_t) == len(flat_l), (len(flat_t), len(flat_l))
    import jax.numpy as jnp
    return jax.tree.unflatten(
        treedef, [jnp.asarray(l) for l in flat_l])
