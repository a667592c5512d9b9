"""Vectorized periodic/reflective boundary handling.

Parity with /root/reference/tempest/mcmc.py:326-411, redesigned as masked
elementwise ops over the whole walker batch (the reference loops over index
lists per walker). Boundary sets are encoded as boolean masks of length
n_dim, fixed at trace time.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def make_boundary_masks(
    n_dim: int,
    periodic: Optional[Sequence[int]] = None,
    reflective: Optional[Sequence[int]] = None,
):
    """Build static (periodic_mask, reflective_mask, strict_mask) bool arrays."""
    p = np.zeros(n_dim, dtype=bool)
    r = np.zeros(n_dim, dtype=bool)
    if periodic is not None:
        p[np.asarray(list(periodic), dtype=int)] = True
    if reflective is not None:
        r[np.asarray(list(reflective), dtype=int)] = True
    strict = ~(p | r)
    return jnp.asarray(p), jnp.asarray(r), jnp.asarray(strict)


def apply_boundary_conditions(
    u: jnp.ndarray, periodic_mask: jnp.ndarray, reflective_mask: jnp.ndarray
) -> jnp.ndarray:
    """Wrap periodic coords mod 1; fold reflective coords back into [0, 1].

    Reflection parity matches mcmc.py:357-364: even number of unit-cell
    crossings keeps the remainder, odd flips it.
    """
    wrapped = u % 1.0
    n_reflect = jnp.floor(u)
    remainder = u - n_reflect
    even = jnp.mod(n_reflect, 2.0) == 0.0
    reflected = jnp.where(even, remainder, 1.0 - remainder)
    out = jnp.where(periodic_mask, wrapped, u)
    out = jnp.where(reflective_mask, reflected, out)
    return out


def check_bounds(u: jnp.ndarray, strict_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-walker validity: strict (non-periodic, non-reflective) coords must
    lie in [0, 1]. Parity: mcmc.py:369-411."""
    ok = ((u >= 0.0) & (u <= 1.0)) | ~strict_mask
    return jnp.all(ok, axis=-1)
