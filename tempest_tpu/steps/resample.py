"""Resampling step: select the next active set from ALL historical particles.

TPU redesign of /root/reference/tempest/steps/resample.py:12-99. The gather
from the flattened history runs on-device; under a sharded particle axis the
index gather lowers to an XLA all-to-all. Multinomial and systematic schemes
share the vectorized inverse-CDF machinery in ops/tools.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cluster import ClusterModel, cluster_predict
from ..ops.tools import multinomial_resample, systematic_resample
from ..state import History


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

    `weights` are the normalized MIS weights over the flattened (masked)
    history; masked slots carry zero weight and are never selected.
    """
    if method == "mult":
        idx = multinomial_resample(key, n_particles, weights)
    elif method == "syst":
        idx = systematic_resample(key, n_particles, weights)
    else:
        raise ValueError(f"Unknown resample method {method}")

    u = hist.flat_u()[idx]
    x = hist.flat_x()[idx]
    logl = hist.flat_logl()[idx]
    blobs = None if hist.blobs is None else hist.flat_blobs()[idx]

    if clustering:
        assignments = cluster_predict(cluster_model, u)
    else:
        assignments = jnp.zeros((n_particles,), dtype=jnp.int32)
    return u, x, logl, blobs, assignments
