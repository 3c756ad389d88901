"""Pytree checkpointing: params + optimizer state + PRNG key + step, with resume.

Exceeds the reference's one-shot `torch.save` at end of training
(`src/misc/torch_utils.py:19-33`): checkpoints are periodic and carry
everything needed to resume mid-run. Storage is ONE self-contained npz (the
pickled treedef rides inside as a uint8 leaf) replaced atomically — a crash
mid-save can never leave a treedef/leaves mismatch on disk. Legacy two-file
checkpoints (npz + `.treedef` sidecar) still load.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

_TREEDEF_KEY = "__treedef__"


def save_checkpoint(path: str, state: Any):
    """Serialize an arbitrary pytree (device arrays become host numpy)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload[_TREEDEF_KEY] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`."""
    with np.load(path) as data:
        if _TREEDEF_KEY in data.files:
            treedef = pickle.loads(data[_TREEDEF_KEY].tobytes())
            num_leaves = len(data.files) - 1
        else:  # legacy format: treedef in a sidecar file
            with open(path + ".treedef", "rb") as f:
                treedef = pickle.load(f)
            num_leaves = len(data.files)
        leaves = [data[f"leaf_{i}"] for i in range(num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
