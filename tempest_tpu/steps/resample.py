"""Resampling step: select the next active set from ALL historical particles.

TPU redesign of /root/reference/tempest/steps/resample.py:12-99. The gather
from the masked history runs on-device. This module is the single-program
(unsharded) path: the CDF inversion happens over the canonically-flattened
weights (t-major sample order, matching the reference's history order) and
the gather is a plain XLA gather. Under a sharded particle axis the fused
pipeline uses parallel/collective.sharded_resample instead, which computes
the SAME canonical-order selection with per-shard prefix sums and moves
only the selected rows (O(N*d) bytes) instead of all-gathering the history.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cluster import ClusterModel, cluster_predict
from ..ops.tools import multinomial_resample, systematic_resample
from ..state import History, gather_history


@partial(jax.jit, static_argnames=("n_particles", "method", "clustering"))
def resample(
    key: jax.Array,
    hist: History,
    weights: jnp.ndarray,
    cluster_model: ClusterModel,
    n_particles: int,
    method: str = "mult",
    clustering: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Draw the new active set (u, x, logl, blobs, assignments).

    `weights` are the normalized MIS weights (T_max, N) over the masked
    history; masked slots carry zero weight and are never selected.
    """
    N = hist.n_particles
    w_flat = weights.reshape(-1)
    if method == "mult":
        idx = multinomial_resample(key, n_particles, w_flat)
    elif method == "syst":
        idx = systematic_resample(key, n_particles, w_flat)
    else:
        raise ValueError(f"Unknown resample method {method}")

    t_idx, n_idx = idx // N, idx % N
    u, x, logl, blobs = gather_history(hist, t_idx, n_idx)

    if clustering:
        assignments = cluster_predict(cluster_model, u)
    else:
        assignments = jnp.zeros((n_particles,), dtype=jnp.int32)
    return u, x, logl, blobs, assignments
