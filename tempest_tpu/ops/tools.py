"""Core stateless numerics, fully jittable and mask-aware.

TPU-native re-designs of the reference's NumPy helpers
(/root/reference/tempest/tools.py:10-228). Every function here operates on
fixed-shape arrays with an optional validity mask so it can run inside jit
with a preallocated, partially-filled history buffer, and shards trivially
over a `particles` mesh axis (reductions lower to psum under pjit).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def logsumexp(logx: jnp.ndarray, axis=None, keepdims: bool = False) -> jnp.ndarray:
    """Numerically-stable logsumexp robust to all -inf inputs."""
    m = jnp.max(logx, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(logx - m_safe), axis=axis, keepdims=True)
    out = m_safe + jnp.log(s)
    out = jnp.where(jnp.isfinite(m), out, m)  # all -inf -> -inf
    return out if keepdims else jnp.squeeze(out, axis=axis) if axis is not None else out.reshape(())


def effective_sample_size(weights: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ESS = 1 / sum(w_norm^2) of (possibly unnormalized) weights.

    Parity: tools.py:120-135. `mask` zeroes out invalid slots first.
    """
    w = jnp.asarray(weights)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    total = jnp.sum(w)
    w = w / total
    return 1.0 / jnp.sum(w * w)


def ess_from_logw(logw: jnp.ndarray) -> jnp.ndarray:
    """ESS directly from (unnormalized) log-weights; -inf entries contribute 0."""
    lse1 = logsumexp(logw)
    lse2 = logsumexp(2.0 * logw)
    return jnp.exp(2.0 * lse1 - lse2)


def compute_ess(logw: jnp.ndarray) -> jnp.ndarray:
    """Normalized ESS fraction in (0, 1]. Parity: tools.py:138-156."""
    return ess_from_logw(logw) / logw.shape[0]


def increment_logz(logw: jnp.ndarray) -> jnp.ndarray:
    """logsumexp of log-weights. Parity: tools.py:159-175."""
    return logsumexp(logw)


def systematic_resample(
    key: jax.Array, size: int, weights: jnp.ndarray
) -> jnp.ndarray:
    """Systematic (stratified single-uniform) resampling.

    TPU redesign of the serial cumulative scan in tools.py:178-228: the
    positions (u0 + i)/size are binned into the weight CDF with a vectorized
    searchsorted — O(N log N) fully parallel instead of an O(N) Python loop.
    Invalid (zero-weight) slots are never selected.
    """
    w = weights / jnp.sum(weights)
    u0 = jax.random.uniform(key, ())
    positions = (u0 + jnp.arange(size, dtype=w.dtype)) / size
    cdf = jnp.cumsum(w)
    cdf = cdf.at[-1].set(1.0)  # guard against rounding shortfall
    idx = jnp.searchsorted(cdf, positions, side="left")
    return jnp.clip(idx, 0, w.shape[0] - 1)


def multinomial_resample(
    key: jax.Array, size: int, weights: jnp.ndarray
) -> jnp.ndarray:
    """Multinomial resampling via the Gumbel-free inverse-CDF method.

    Parity with np.random.choice(p=weights) (resample.py:79-82) in
    distribution. Uses independent uniforms + searchsorted on the CDF,
    which is fully vectorized and shard-friendly.
    """
    w = weights / jnp.sum(weights)
    cdf = jnp.cumsum(w)
    cdf = cdf.at[-1].set(1.0)
    us = jax.random.uniform(key, (size,), dtype=w.dtype)
    idx = jnp.searchsorted(cdf, us, side="left")
    return jnp.clip(idx, 0, w.shape[0] - 1)


@partial(jax.jit, static_argnames=("bins",))
def trim_weights_mask(
    weights: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    ess: float = 0.99,
    bins: int = 1000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trim tiny weights while preserving an ESS fraction, as a mask.

    Fixed-shape redesign of tools.py:10-55: instead of boolean fancy-indexing
    (dynamic output shape), returns (keep_mask, trimmed_normalized_weights)
    of the input shape. The reference scans percentiles p = linspace(0, 99,
    bins) from the top down and keeps the largest p whose threshold preserves
    `ess` fraction of the untrimmed ESS; here all bins are evaluated at once
    via a sorted-suffix-cumsum formulation and the max qualifying bin chosen.

    `mask` marks valid entries; invalid entries are excluded from the
    percentile computation and always trimmed.
    """
    w = jnp.asarray(weights)
    n = w.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    w = jnp.where(mask, w, 0.0)
    w = w / jnp.sum(w)
    n_valid = jnp.sum(mask)

    ess_total = 1.0 / jnp.sum(w * w)

    # Weighted percentile thresholds over the *valid* weights, matching
    # np.percentile's linear interpolation on sorted data.
    # Sort with invalid entries pushed to +inf (end) so the first n_valid
    # sorted slots are the valid weights ascending.
    sort_keys = jnp.where(mask, w, jnp.inf)
    w_sorted = jnp.sort(sort_keys)

    percentiles = jnp.linspace(0.0, 99.0, bins)
    # np.percentile: index = p/100 * (n_valid - 1), linear interpolation
    virt = percentiles / 100.0 * (n_valid - 1).astype(w.dtype)
    lo = jnp.floor(virt).astype(jnp.int32)
    hi = jnp.ceil(virt).astype(jnp.int32)
    frac = virt - lo.astype(w.dtype)
    thresholds = w_sorted[lo] * (1.0 - frac) + w_sorted[hi] * frac  # (bins,)

    # For each bin: keep weights >= threshold; ESS of kept set via suffix sums
    # of sorted weights. Position of threshold in sorted order:
    cum_w = jnp.cumsum(w_sorted * jnp.isfinite(w_sorted))
    cum_w2 = jnp.cumsum(jnp.where(jnp.isfinite(w_sorted), w_sorted * w_sorted, 0.0))
    total_w = cum_w[n - 1]
    total_w2 = cum_w2[n - 1]
    # first index with w_sorted >= threshold
    cut = jnp.searchsorted(w_sorted, thresholds, side="left")  # (bins,)
    kept_w = total_w - jnp.where(cut > 0, cum_w[cut - 1], 0.0)
    kept_w2 = total_w2 - jnp.where(cut > 0, cum_w2[cut - 1], 0.0)
    ess_trimmed = (kept_w * kept_w) / jnp.maximum(kept_w2, 1e-300)
    ok = ess_trimmed / ess_total >= ess  # (bins,)

    # Largest qualifying bin (reference scans i = bins-1 downward).
    bin_ids = jnp.arange(bins)
    best = jnp.max(jnp.where(ok, bin_ids, -1))
    best = jnp.maximum(best, 0)  # bin 0 (p=0) always keeps everything
    threshold = thresholds[best]

    keep = mask & (w >= threshold)
    w_keep = jnp.where(keep, w, 0.0)
    w_keep = w_keep / jnp.sum(w_keep)
    return keep, w_keep


def logsumexp_psum(logx: jnp.ndarray, axis_name: Optional[str] = None) -> jnp.ndarray:
    """Logsumexp over ALL array axes plus (optionally) a mesh axis.

    For shard_map bodies: each shard reduces its local block, then a pmax +
    psum pair combines shards. axis_name=None degrades to plain logsumexp,
    so the same numerics serve the unsharded path.
    """
    if axis_name is None:
        return logsumexp(logx)
    m = jnp.max(logx)
    m = jax.lax.pmax(m, axis_name)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jax.lax.psum(jnp.sum(jnp.exp(logx - m_safe)), axis_name)
    out = m_safe + jnp.log(s)
    return jnp.where(jnp.isfinite(m), out, m)


def ess_from_logw_psum(logw: jnp.ndarray, axis_name: Optional[str] = None) -> jnp.ndarray:
    """ESS from log-weights, reducing over shards when axis_name given."""
    lse1 = logsumexp_psum(logw, axis_name)
    lse2 = logsumexp_psum(2.0 * logw, axis_name)
    return jnp.exp(2.0 * lse1 - lse2)


def volume_variation_dtn(
    u: jnp.ndarray,
    w: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """`volume_variation` over the (d, T, N) history layout.

    Same math as `volume_variation` (tools.py:58-117 in the reference) but
    expressed as contractions over the (T, N) sample axes so the sharded
    particle axis never needs to be flattened or gathered: every reduction
    is local + (optionally) a psum of at most (d, d) values.
    """
    d = u.shape[0]
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    w = w / _psum(jnp.sum(w), axis_name)

    mean = _psum(jnp.einsum("dtn,tn->d", u, w), axis_name)  # (d,)
    uc = u - mean[:, None, None]
    if mask is not None:
        uc = jnp.where(mask[None], uc, 0.0)
    cov = _psum(jnp.einsum("dtn,etn,tn->de", uc, uc, w), axis_name)  # (d, d)

    eigvals = jnp.linalg.eigvalsh(cov)
    tol = jnp.max(jnp.abs(eigvals)) * d * jnp.finfo(u.dtype).eps
    rank = jnp.sum(eigvals > tol)
    reg = 1e-6 * jnp.trace(cov)
    cov = jnp.where(rank < d, cov + jnp.eye(d, dtype=u.dtype) * reg, cov)

    cov_inv = jnp.linalg.inv(cov)
    # d2[t,n] = uc[:,t,n]^T cov_inv uc[:,t,n].
    # Decomposed EXPLICITLY (matmul over the major d axis, then an
    # elementwise reduce) instead of a single three-operand einsum: left
    # to its own devices XLA:TPU lowers the latter through a sample-major
    # ((S, d)-layout) contraction and materializes layout-transposed
    # copies of the ENTIRE history inside the surrounding program —
    # measured as two ~4 GiB remat copies of (100, 192, 49152) u, the
    # compile-OOM that capped the whole-run fused path at large N x d.
    # This form keeps every operand in the native (d, T, N) S-minor
    # layout.
    a = jnp.einsum("de,dtn->etn", cov_inv, uc)
    d2 = jnp.einsum("etn,etn->tn", a, uc)
    deviation = jnp.clip(d2 - d, -1e6, 1e6)
    cv = 0.5 * jnp.sqrt(_psum(jnp.sum(w * w * deviation * deviation), axis_name))

    n_valid = _psum(
        jnp.sum(mask) if mask is not None else jnp.asarray(w.size), axis_name
    )
    bad = (~jnp.isfinite(cv)) | (n_valid < d + 1) | (~jnp.all(jnp.isfinite(cov_inv)))
    return jnp.where(bad, jnp.asarray(1e10, dtype=u.dtype), cv)


def _psum(x, axis_name: Optional[str]):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def volume_variation(
    x: jnp.ndarray,
    w: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Influence-function CV of the confidence-ellipsoid volume.

    Parity: tools.py:58-117 — CV = 0.5 * sqrt(sum_i w_i^2 (d_i^2 - D)^2)
    with Mahalanobis distances d_i under the weighted covariance; returns
    1e10 for degenerate inputs (too few samples, singular/non-finite cov).
    Mask-aware and jit-safe: no exceptions, all failure paths are selects.
    """
    x = jnp.asarray(x)
    n, d = x.shape
    if w is None:
        w = jnp.ones((n,), dtype=x.dtype)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    w = w / jnp.sum(w)

    mean = jnp.sum(x * w[:, None], axis=0)
    xc = x - mean
    if mask is not None:
        xc = jnp.where(mask[:, None], xc, 0.0)
    cov = xc.T @ (xc * w[:, None])

    # Rank check via eigenvalues (cheap: d x d), regularize if deficient.
    eigvals = jnp.linalg.eigvalsh(cov)
    tol = jnp.max(jnp.abs(eigvals)) * d * jnp.finfo(x.dtype).eps
    rank = jnp.sum(eigvals > tol)
    reg = 1e-6 * jnp.trace(cov)
    cov = jnp.where(rank < d, cov + jnp.eye(d, dtype=x.dtype) * reg, cov)

    cov_inv = jnp.linalg.inv(cov)
    d2 = jnp.sum((xc @ cov_inv) * xc, axis=1)
    deviation = jnp.clip(d2 - d, -1e6, 1e6)
    cv = 0.5 * jnp.sqrt(jnp.sum(w * w * deviation * deviation))

    n_valid = jnp.sum(mask) if mask is not None else n
    bad = (~jnp.isfinite(cv)) | (n_valid < d + 1) | (~jnp.all(jnp.isfinite(cov_inv)))
    return jnp.where(bad, jnp.asarray(1e10, dtype=x.dtype), cv)
