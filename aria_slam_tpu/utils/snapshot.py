"""SLAM-state snapshot / resume.

SURVEY.md §5.4: the reference has no checkpointing; the TPU build adds
'optional SLAM-state snapshot (EKF state, keyframe DB, pose graph) for
resumable evaluation'. The FrameState carry is a pytree, so snapshot =
one device->host transfer + np.savez; resume = load + device_put.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_state(state, path: str) -> None:
    """Serialize any pytree of arrays (e.g. pipeline FrameState)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {}
    for i, x in enumerate(leaves):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(x))
            arrays[f"iskey_{i}"] = np.asarray(True)
        else:
            arrays[f"leaf_{i}"] = np.asarray(x)
    np.savez_compressed(path, **arrays)


def load_state(template, path: str):
    """Restore into the structure of `template` (same config/shapes)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if f"iskey_{i}" in data:
            out.append(jax.random.wrap_key_data(jnp.asarray(arr)))
        else:
            out.append(jnp.asarray(arr, dtype=ref.dtype if hasattr(ref, "dtype") else None))
    return jax.tree_util.tree_unflatten(treedef, out)
