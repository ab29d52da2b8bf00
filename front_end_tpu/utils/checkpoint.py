"""State serialization — the `serializeWindow` capability, pytree-native.

The reference checkpoints its sliding-window state with msgpack
(`/root/reference/src/front_end/algorithm.py:119-143`
serializeWindow/deserializeWindow) so batch jobs can resume.  Here ANY
carried pipeline state — `VOState`, `WindowVOState`, tracker
`WindowState`, sweep results — is a JAX pytree of arrays, so one pair of
functions covers all of them: flatten to arrays -> one .npz; restore by
unflattening into the template produced by the matching `init_state`
(shape/dtype-checked).  No pickle: files are plain numpy archives.
"""
from __future__ import annotations

import jax
import numpy as np


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' to extensionless paths; np.load does not.
    Normalize so `save_pytree(p)` and `load_pytree(p)` round-trip for
    ANY p the user types."""
    return path if path.endswith(".npz") else path + ".npz"


def save_pytree(path: str, tree) -> int:
    """Write a pytree of arrays to `path` (.npz).  Returns leaf count."""
    leaves = jax.tree_util.tree_leaves(tree)
    # 8-digit zero-pad: keys are paired with template leaves by sorted()
    # order on load, which must stay lexicographic == numeric
    arrs = {f"leaf_{i:08d}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(_npz_path(path), **arrs)
    return len(leaves)


def load_pytree(path: str, template):
    """Read arrays from `path` back into `template`'s structure.

    `template` is a same-shaped pytree (e.g. a fresh `init_state(...)`);
    every leaf is shape/dtype-checked against it so a config mismatch
    fails loudly instead of resuming garbage.
    """
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(_npz_path(path)) as z:
        keys = sorted(z.files)
        if len(keys) != len(t_leaves):
            raise ValueError(
                f"checkpoint has {len(keys)} leaves, template "
                f"{len(t_leaves)} — config mismatch")
        leaves = []
        for k, t in zip(keys, t_leaves):
            a = z[k]
            ts = np.shape(t)
            if tuple(a.shape) != tuple(ts):
                raise ValueError(
                    f"leaf {k}: checkpoint shape {a.shape} != template "
                    f"shape {ts} — config mismatch")
            td = np.asarray(t).dtype
            if a.dtype != td:
                raise ValueError(
                    f"leaf {k}: checkpoint dtype {a.dtype} != template "
                    f"dtype {td} — config mismatch")
            leaves.append(jax.numpy.asarray(a))
    return jax.tree_util.tree_unflatten(treedef, leaves)
