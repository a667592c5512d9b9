"""Device->host transfers that are safe under multi-process (multi-host) SPMD.

In a multi-controller job the history/current buffers are sharded over a
mesh that spans processes; `np.asarray` on such an array raises ("spans
non-addressable devices"). `fetch` gathers the global value with
`multihost_utils.process_allgather` — a collective, so every process must
call it at the same point, which holds here because all host-side control
flow branches on replicated scalars. Single-process arrays take the plain
`np.asarray` fast path.

This replaces the reference's implicit "everything already lives on the
master" assumption (its workers only ever run the likelihood,
core.py:430-440); in the SPMD design the master/worker distinction
disappears and the host boundary needs an explicit gather instead.
"""

from __future__ import annotations

import jax
import numpy as np


def fetch(arr) -> np.ndarray:
    """Global numpy value of `arr`, collective-gathering if it spans hosts."""
    if isinstance(arr, jax.Array) and not (
        arr.is_fully_addressable or arr.is_fully_replicated
    ):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)


def fetch_tree(tree):
    """`fetch` mapped over a pytree (None leaves preserved)."""
    return jax.tree_util.tree_map(fetch, tree)


def sync(tag: str = "tempest") -> None:
    """Barrier across all processes (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def is_primary() -> bool:
    """True on the process responsible for writing files / logging."""
    return jax.process_index() == 0
