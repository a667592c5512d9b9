"""Mode statistics for the preconditioned MCMC proposals.

Fixed-shape, K_max-padded redesign of /root/reference/tempest/modes.py:7-295:
per-mode means/covariances/dof plus precomputed Cholesky factors and inverse
covariances, with a `k_mask` marking which of the K_max slots hold real
modes. Fitting is a weighted-resample + Student-t EM per mode, batched with
`vmap` over the padded mode axis so cluster counts never change array shapes
(no recompilation when the hierarchical clusterer changes K).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .student import fit_mvstud_weighted

_REG_FLOOR = 1e-6


@struct.dataclass
class ModeStatistics:
    means: jnp.ndarray  # (K_max, d)
    covariances: jnp.ndarray  # (K_max, d, d)
    degrees_of_freedom: jnp.ndarray  # (K_max,)
    inv_covariances: jnp.ndarray  # (K_max, d, d)
    chol_covariances: jnp.ndarray  # (K_max, d, d)
    k_mask: jnp.ndarray  # (K_max,) bool — which slots are real modes

    @property
    def k_max(self) -> int:
        return self.means.shape[0]

    @property
    def n_dim(self) -> int:
        return self.means.shape[1]

    def n_modes(self) -> jnp.ndarray:
        return jnp.sum(self.k_mask)


def _decompose(cov: jnp.ndarray):
    """Cholesky + inverse with NaN-detected diagonal regularization.

    Parity: modes.py:101-119 (reg floor max(1e-6, 1e-6*|trace|)).
    """
    d = cov.shape[0]
    L = jnp.linalg.cholesky(cov)
    bad = ~jnp.all(jnp.isfinite(L))
    reg = jnp.maximum(_REG_FLOOR, _REG_FLOOR * jnp.abs(jnp.trace(cov)))
    cov2 = jnp.where(bad, cov + jnp.eye(d, dtype=cov.dtype) * reg, cov)
    L2 = jnp.where(bad, jnp.linalg.cholesky(cov2), L)
    eye = jnp.eye(d, dtype=cov.dtype)
    inv = jax.scipy.linalg.cho_solve((L2, True), eye)
    return cov2, L2, inv


def make_mode_statistics(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    degrees_of_freedom: jnp.ndarray,
    k_mask: Optional[jnp.ndarray] = None,
) -> ModeStatistics:
    """Construct with precomputed decompositions (vmapped over modes)."""
    means = jnp.atleast_2d(jnp.asarray(means))
    covariances = jnp.asarray(covariances)
    if covariances.ndim == 2:
        covariances = covariances[None]
    degrees_of_freedom = jnp.atleast_1d(jnp.asarray(degrees_of_freedom))
    if k_mask is None:
        k_mask = jnp.ones((means.shape[0],), dtype=bool)
    covs, chols, invs = jax.vmap(_decompose)(covariances)
    return ModeStatistics(
        means=means,
        covariances=covs,
        degrees_of_freedom=degrees_of_freedom,
        inv_covariances=invs,
        chol_covariances=chols,
        k_mask=k_mask,
    )


def identity_mode_statistics(n_dim: int, k_max: int = 1, dof: float = 1e6, dtype=jnp.float32) -> ModeStatistics:
    """Dummy single-mode stats used at beta=0 (train.py:79-88)."""
    means = jnp.zeros((k_max, n_dim), dtype=dtype)
    covs = jnp.broadcast_to(jnp.eye(n_dim, dtype=dtype), (k_max, n_dim, n_dim))
    dofs = jnp.full((k_max,), dof, dtype=dtype)
    k_mask = jnp.arange(k_max) < 1
    return ModeStatistics(
        means=means,
        covariances=covs,
        degrees_of_freedom=dofs,
        inv_covariances=covs,
        chol_covariances=covs,
        k_mask=k_mask,
    )


def _fit_one_mode(u, w_cluster, dof_fallback, sort_cache=None):
    """Weighted Student-t fit for one mode's weights.

    `w_cluster` is zero outside the mode; empty modes get identity stats.
    The reference resamples each cluster to 4x its member count and fits
    the resampled points unweighted (modes.py:196-205); the weighted
    sufficient-statistics EM (student.fit_mvstud_weighted) targets the same
    distribution without the resampling noise and at O(n) instead of
    O(4*N_total) work per mode — measured ~4x faster clustered iterations.
    `sort_cache` is the shared per-dimension sort of `u` (all modes fit the
    same points under different weights, so it is computed once).
    """
    d = u.shape[1]
    total = jnp.sum(w_cluster)
    empty = total <= 0.0
    mean, cov, dof = fit_mvstud_weighted(u, w_cluster, sort_cache=sort_cache)
    dof = jnp.where(jnp.isfinite(dof), dof, dof_fallback)
    mean = jnp.where(empty, jnp.zeros_like(mean), mean)
    cov = jnp.where(empty, jnp.eye(d, dtype=cov.dtype), cov)
    dof = jnp.where(empty, dof_fallback, dof)
    return mean, cov, dof, ~empty


@partial(jax.jit, static_argnames=("k_max",))
def fit_mode_statistics(
    u: jnp.ndarray,
    weights: jnp.ndarray,
    labels: jnp.ndarray,
    k_max: int,
    dof_fallback: float = 1e6,
) -> ModeStatistics:
    """Per-cluster weighted Student-t fits, batched over the padded modes.

    Parity: ModeStatistics.from_particles (modes.py:131-219). `weights` must
    already be masked (zero for invalid/trimmed history slots); `labels`
    assigns each sample to a mode in [0, k_max). Deterministic — the
    weighted EM needs no resampling RNG.
    """
    onehot = labels[None, :] == jnp.arange(k_max)[:, None]  # (k_max, n)
    w_k = jnp.where(onehot, weights[None, :], 0.0)  # (k_max, n)
    order = jnp.argsort(u, axis=0)
    sort_cache = (jnp.take_along_axis(u, order, axis=0), order)
    means, covs, dofs, mask = jax.vmap(
        lambda wk: _fit_one_mode(u, wk, dof_fallback, sort_cache)
    )(w_k)
    covs, chols, invs = jax.vmap(_decompose)(covs)
    return ModeStatistics(
        means=means,
        covariances=covs,
        degrees_of_freedom=dofs,
        inv_covariances=invs,
        chol_covariances=chols,
        k_mask=mask,
    )


def fit_global_mode(
    u: jnp.ndarray,
    weights: jnp.ndarray,
    dof_fallback: float = 1e6,
) -> ModeStatistics:
    """Single global weighted Student-t fit (from_global, modes.py:221-288)."""
    labels = jnp.zeros(u.shape[0], dtype=jnp.int32)
    return fit_mode_statistics(
        u, weights, labels, k_max=1, dof_fallback=dof_fallback
    )
