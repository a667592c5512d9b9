"""Device mesh + sharding layout for the particle axis.

The scalable dimension of Persistent Sampling is the particle/history axis
(history grows by n_particles per iteration) — the analogue of the
reference's process-pool likelihood fan-out (core.py:430-440 and
docs/user_guide/parallelization.md), re-expressed as SPMD sharding:

- History buffers (T_max, N, d) and the active set (N, d) are sharded on N
  over a 1-D `particles` mesh axis (ICI within a slice, DCN across slices);
- every reduction in the pipeline (logsumexp weight normalization, ESS,
  logZ, covariance sufficient statistics, acceptance means) lowers to psum;
- resampling's global gather lowers to an all-to-all / all-gather.

All of that is inserted automatically by XLA's SPMD partitioner from these
input shardings — no hand-written collectives needed on the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import Current, History


def make_particle_mesh(
    n_devices: Optional[int] = None, axis_name: str = "particles"
) -> Mesh:
    """1-D mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def history_sharding(mesh: Mesh, axis_name: str = "particles"):
    """PartitionSpecs for each History field (N axis sharded).

    The coordinate buffers are (d, T_max, N) with N minor (state.py layout
    notes); the particle axis is the last dimension there and the last
    dimension of the (T_max, N) scalar buffers.
    """
    pdim = NamedSharding(mesh, P(None, axis_name))  # (T_max, N)
    pdim3 = NamedSharding(mesh, P(None, None, axis_name))  # (d, T_max, N)
    rep = NamedSharding(mesh, P())  # per-iteration scalars replicated
    return History(
        u=pdim3, x=pdim3, logl=pdim, mis_c=pdim,
        blobs=pdim3,
        beta=rep, logz=rep, ess=rep, cv=rep,
        acceptance=rep, efficiency=rep, steps=rep, calls=rep, t=rep,
    )


def current_sharding(mesh: Mesh, axis_name: str = "particles"):
    pvec = NamedSharding(mesh, P(axis_name))  # (N,)
    pmat = NamedSharding(mesh, P(axis_name, None))  # (N, d)
    rep = NamedSharding(mesh, P())
    return Current(
        u=pmat, x=pmat, logl=pvec, blobs=pmat, assignments=pvec,
        beta=rep, logz=rep, ess=rep, cv=rep,
        acceptance=rep, efficiency=rep, steps=rep, calls=rep, iteration=rep,
    )


def _device_put_tree(tree, shardings):
    def put(leaf, sh):
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map(put, tree, shardings)


def shard_history(hist: History, mesh: Mesh, axis_name: str = "particles") -> History:
    """Place a History with the particle axis sharded over the mesh."""
    sh = history_sharding(mesh, axis_name)
    if hist.blobs is None:
        sh = sh.replace(blobs=None)
    return _device_put_tree(hist, sh)


def shard_current(cur: Current, mesh: Mesh, axis_name: str = "particles") -> Current:
    sh = current_sharding(mesh, axis_name)
    if cur.blobs is None:
        sh = sh.replace(blobs=None)
    return _device_put_tree(cur, sh)
