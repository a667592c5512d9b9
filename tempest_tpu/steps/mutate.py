"""Mutation step: warm-up prior sampling and MCMC dispatch.

TPU redesign of /root/reference/tempest/steps/mutate.py:12-200. The beta=0
warm-up (fresh prior draws, batched likelihood, resampling-away infinite
log-likelihoods with the logZ correction) is one jitted program; beta>0
dispatches to the fused adaptive-MCMC kernel in mcmc.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.tools import multinomial_resample


class WarmupResult(NamedTuple):
    u: jnp.ndarray
    x: jnp.ndarray
    logl: jnp.ndarray
    blobs: Optional[jnp.ndarray]
    logz_correction: jnp.ndarray  # additive logZ correction (mutate.py:144-148)


def make_warmup_kernel(
    log_likelihood_batch: Callable,
    prior_transform_batch: Callable,
    n_particles: int,
    n_dim: int,
    dtype=jnp.float32,
):
    """Build the jitted beta=0 warm-up draw (mutate.py:99-149)."""

    def warmup(key: jax.Array) -> WarmupResult:
        k_draw, k_patch = jax.random.split(key)
        u = jax.random.uniform(k_draw, (n_particles, n_dim), dtype=dtype)
        x = prior_transform_batch(u)
        logl, blobs = log_likelihood_batch(x)
        logl = logl.astype(dtype)

        # Resample-away infinite log-likelihoods (mutate.py:122-148):
        # infinite-logl particles are replaced by uniform draws from the
        # finite ones, and logZ gains log(n_finite / n_total).
        inf_mask = jnp.isinf(logl)
        n_finite = jnp.sum(~inf_mask)
        any_inf = jnp.any(inf_mask)
        can_patch = any_inf & (n_finite > 0)

        p = jnp.where(inf_mask, 0.0, 1.0)
        p = p / jnp.maximum(jnp.sum(p), 1.0)
        repl = multinomial_resample(k_patch, n_particles, p)

        def patch(arr, rep):
            if arr is None:
                return None
            sel = inf_mask if arr.ndim == 1 else inf_mask[:, None]
            return jnp.where(can_patch & sel, rep, arr)

        u = patch(u, u[repl])
        x = patch(x, x[repl])
        logl = patch(logl, logl[repl])
        blobs = patch(blobs, None if blobs is None else blobs[repl])

        frac = n_finite.astype(dtype) / n_particles
        logz_corr = jnp.where(any_inf, jnp.log(frac), jnp.asarray(0.0, dtype))
        return WarmupResult(u=u, x=x, logl=logl, blobs=blobs, logz_correction=logz_corr)

    return jax.jit(warmup)
