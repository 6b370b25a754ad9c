"""Checkpoint/resume for streaming demod state.

The reference has no checkpointing; its nearest analog is the in-memory
carryover between chunks (opv-demod.cpp:316-347).  Here the full carry —
loop filter state, sync tracker state, soft-symbol history, counters — is an
explicit pytree that can be serialized and restored, which doubles as the
block-seam handoff record for sharded streaming (SURVEY.md section 5).
"""

from __future__ import annotations

import jax
import numpy as np


def _norm(path: str) -> str:
    # np.savez appends .npz on write; normalize so load finds the same file
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, tree) -> None:
    leaves, _ = jax.tree.flatten(tree)
    np.savez(_norm(path), n_leaves=np.int64(len(leaves)),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_state(path: str, like):
    """Restore a state saved with save_state, using `like` for structure."""
    data = np.load(_norm(path))
    leaves_like, treedef = jax.tree.flatten(like)
    if int(data["n_leaves"]) != len(leaves_like):
        raise ValueError(
            f"checkpoint has {int(data['n_leaves'])} leaves but the target "
            f"structure has {len(leaves_like)} — wrong `like` template?")
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, leaves)
