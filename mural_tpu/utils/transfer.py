"""Packed device->host fetches.

``flax.serialization.to_bytes`` (and any per-leaf ``np.asarray``) fetches
each of the model's ~300 parameter buffers with its own device round
trip; on a remote-device transport (axon tunnel) the per-transfer
latency dominates and a checkpoint save costs seconds.  ``fetch_packed``
concatenates all same-dtype leaves into one flat device array per dtype
(one jitted dispatch), fetches each with a single transfer, and splits
back on the host.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

import numpy as np


@lru_cache(maxsize=32)
def _concat_fn(n_leaves: int, dtype_str: str):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def concat(leaves):
        return jnp.concatenate([jnp.ravel(l) for l in leaves])

    return concat


def fetch_packed(tree: Any) -> Any:
    """Device pytree -> host numpy pytree with one transfer per dtype."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    by_dtype = {}
    for i, leaf in enumerate(leaves):
        by_dtype.setdefault(np.dtype(leaf.dtype).str, []).append(i)
    out = [None] * len(leaves)
    for dtype_str, idxs in by_dtype.items():
        group = [leaves[i] for i in idxs]
        if len(group) == 1:
            out[idxs[0]] = np.asarray(group[0])
            continue
        flat = np.asarray(_concat_fn(len(group), dtype_str)(group))
        pos = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].ndim else 1
            out[i] = flat[pos:pos + n].reshape(leaves[i].shape)
            pos += n
    return jax.tree.unflatten(treedef, out)
