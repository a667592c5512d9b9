"""Multivariate Student-t EM fit — fully jitted, vmappable over clusters.

Re-design of /root/reference/tempest/student.py:6-116 for XLA:
- the EM loop is a `lax.while_loop` with the reference's convergence rule
  (|nu_prev - nu| > tol, capped at max_iter);
- the nu update solves the digamma stationarity equation by *log-space*
  bisection over nu in [1e-30, 1e30] with a fixed iteration count (the
  reference uses scipy.optimize.bisect over [1e-300, 1e300]; the root agrees
  to float precision, and fixed trip counts keep the loop jittable);
- singular-covariance handling detects the NaN output of
  `jnp.linalg.cholesky` (XLA raises no exceptions) and applies the same
  1e-6·|trace| diagonal regularization floor (student.py:66-88, 109-115);
- nu -> infinity (Gaussian limit) is signaled by `inf` exactly like the
  reference, with the caller applying DOF_FALLBACK.

Note an intentional improvement over the reference: its Gaussian-limit
test `func0(1e300) >= 0` (student.py:54) evaluates a fully-cancelled
float64 expression whose sign is rounding luck — on this platform it is
always True, so the reference returns nu=inf for ANY data (its own tests
hedge with `if np.isfinite(nu)`), silently degrading the t-preconditioner
to Gaussian. Here the stationarity function is evaluated in
cancellation-free form (log1p/e-form data term + asymptotic
log-minus-digamma), so genuinely heavy-tailed data gets a finite,
accurate nu (verified against dense scans of the same equation).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

_REG_FLOOR = 1e-6
_NU_LOG_LO = -69.0  # log(1e-30)
# Upper bracket at nu = 1e6 (== DOF_FALLBACK): beyond this the Student-t is
# a Gaussian to float32 precision AND the stationarity function itself
# underflows (all terms ~1/nu^2), so "f(nu_hi) >= 0" is only a meaningful
# Gaussian-limit test when nu_hi stays where float32 has signal. The
# reference brackets at 1e300 in float64 (student.py:54); any root above
# 1e6 is indistinguishable from its own DOF_FALLBACK.
_NU_LOG_HI = 13.815511  # log(1e6)
# 16-way multisection: each pass evaluates 15 interior points in parallel
# and shrinks the bracket 16x, so 5 passes resolve the 138-log-unit bracket
# to 138/16^5 ~ 1.3e-4 log-units (~0.013% relative nu) with sequential
# depth 5 instead of 45 scalar bisection steps — the nu update sits inside
# every EM iteration, so its latency multiplies.
_NU_SPLIT = 16
_NU_PASSES = 5


def _ensure_pd(Sigma: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Regularize Sigma if Cholesky fails; return (Sigma, chol)."""
    d = Sigma.shape[0]
    L = jnp.linalg.cholesky(Sigma)
    bad = ~jnp.all(jnp.isfinite(L))
    reg = jnp.maximum(_REG_FLOOR, _REG_FLOOR * jnp.abs(jnp.trace(Sigma)))
    Sigma2 = jnp.where(bad, Sigma + jnp.eye(d, dtype=Sigma.dtype) * reg, Sigma)
    L2 = jnp.where(bad, jnp.linalg.cholesky(Sigma2), L)
    return Sigma2, L2


def _log_minus_digamma(x):
    """log(x) - digamma(x), cancellation-free for large x.

    Direct float32 evaluation loses all precision once x >> 1 (both terms
    ~log x, difference ~1/(2x)); the asymptotic series 1/(2x) + 1/(12x^2)
    - 1/(120x^4) is exact to float32 beyond x=20. Without this, the
    nu M-step's Gaussian-limit test (f(nu_max) >= 0) fires spuriously for
    genuinely finite-but-large nu (~1e3).
    """
    direct = jnp.log(x) - digamma(x)
    inv = 1.0 / x
    series = 0.5 * inv + (1.0 / 12.0) * inv * inv - (1.0 / 120.0) * inv**4
    return jnp.where(x > 20.0, series, direct)


def _nu_objective(log_nu, delta, dim, wbar):
    """Digamma stationarity equation of the nu M-step (student.py:40-52).

    Algebraically identical to the reference's
        -digamma(nu/2) + log(nu/2) + mean(log w) - mean(w) + 1
        + digamma((nu+dim)/2) - log((nu+dim)/2),   w = (nu+dim)/(nu+delta)
    but rearranged for float32: mean(log w - w + 1) = mean(log1p(e) - e)
    with e = (dim - delta)/(nu + delta) (exact even when w ~ 1), and the
    digamma terms via the cancellation-free _log_minus_digamma. Vectorized
    over a leading axis of log_nu candidates; delta is (n,).

    `wbar` are normalized sample weights (sum 1): the equal-weight case
    passes the scalar 1/n, the weighted Student-t fit passes true weights
    (the mean over samples becomes a weighted mean).
    """
    nu = jnp.exp(log_nu)[..., None]  # (..., 1)
    e = (dim - delta) / (nu + delta)  # (..., n);  w = 1 + e
    data_term = jnp.sum(wbar * (jnp.log1p(e) - e), axis=-1)
    nu = nu[..., 0]
    return (
        _log_minus_digamma(nu / 2.0)
        - _log_minus_digamma((nu + dim) / 2.0)
        + data_term
    )


def _nu_converged(nu, last_nu, tolerance):
    """EM stopping test for the nu sequence.

    Two criteria, either suffices:
    * |d nu| <= tolerance * max(1, |nu|) — the reference's absolute 1e-6
      test (student.py:71), relative-scaled so it can trigger at all for
      nu >> 1 in float32.
    * |d(1/nu)| <= 1000 * eps(dtype) — convergence in the NATURAL
      parameter. Every use of nu (t density, tpCN scale mixture, E-step
      weights) depends on it smoothly through 1/nu, and near the Gaussian
      limit the stationarity objective is so flat that the float32
      multisection root JITTERS by ~1% of nu forever (measured: a
      4096-point mode fit reached nu ~ 152 in 4 iterations, then
      oscillated +/-1.5 for the remaining 96, dragging every vmapped
      sibling mode through max_iter — ~9.5 ms of the flagship's 16.6 ms
      steady-state iteration). 1000*eps is ~1.2e-4 in f32 (nu resolved to
      ~0.01 at nu=10, ~1 at nu=100 — far below any statistical
      resolution) and ~2e-13 in f64, where the quieter objective keeps
      near-reference precision.

    last_nu starts at 0 -> 1/last_nu = inf -> never converged on the
    first pass, preserving the at-least-one-iteration contract.
    """
    tol = tolerance * jnp.maximum(1.0, jnp.abs(nu))
    inv_tol = 1000.0 * jnp.finfo(jnp.asarray(nu).dtype).eps
    safe_last = jnp.where(last_nu == 0.0, jnp.asarray(jnp.inf, jnp.asarray(nu).dtype), last_nu)
    return (jnp.abs(last_nu - nu) <= tol) | (
        jnp.abs(1.0 / safe_last - 1.0 / nu) <= inv_tol
    )


def _opt_nu(delta: jnp.ndarray, dim: int, wbar) -> jnp.ndarray:
    """Solve for nu; returns +inf when the Gaussian limit is optimal.

    f decreases from +inf at nu->0 to f(hi); a 16-way multisection keeps
    the sign change: lo stays at the last interior point with f > 0.
    """
    f_hi = _nu_objective(jnp.asarray(_NU_LOG_HI, delta.dtype), delta, dim, wbar)
    is_inf = f_hi >= 0.0

    fracs = (jnp.arange(1, _NU_SPLIT, dtype=delta.dtype)) / _NU_SPLIT  # (15,)

    def body(_, bounds):
        lo, hi = bounds
        mids = lo + (hi - lo) * fracs  # (15,) ascending
        fm = _nu_objective(mids, delta, dim, wbar)  # (15,)
        count = jnp.sum(fm > 0.0)  # first `count` points have f > 0
        grid = jnp.concatenate([lo[None], mids, hi[None]])  # (17,)
        return grid[count], grid[count + 1]

    lo0 = jnp.asarray(_NU_LOG_LO, delta.dtype)
    hi0 = jnp.asarray(_NU_LOG_HI, delta.dtype)
    lo, hi = jax.lax.fori_loop(0, _NU_PASSES, body, (lo0, hi0))
    nu = jnp.exp(0.5 * (lo + hi))
    return jnp.where(is_inf, jnp.inf, nu)


@partial(jax.jit, static_argnames=("max_iter",))
def fit_mvstud(
    data: jnp.ndarray, tolerance: float = 1e-6, max_iter: int = 100
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit a multivariate Student-t by EM. data: (n, dim) -> (mu, Sigma, nu).

    nu == +inf signals the Gaussian limit (caller applies its dof fallback),
    matching the reference contract (student.py:92-94).
    """
    data = jnp.asarray(data)
    n, dim = data.shape
    fdtype = data.dtype

    mu0 = jnp.median(data, axis=0)
    xc = data - jnp.mean(data, axis=0)
    cov_biased = (xc.T @ xc) / n
    var_biased = jnp.var(data, axis=0)
    Sigma0 = cov_biased + jnp.diag(var_biased) / n
    nu0 = jnp.asarray(20.0, fdtype)

    def cond(carry):
        mu, Sigma, nu, last_nu, i, hit_inf = carry
        return (~_nu_converged(nu, last_nu, tolerance)) & (i < max_iter) & (~hit_inf)

    def body(carry):
        mu, Sigma, nu, last_nu, i, hit_inf = carry
        Sigma, L = _ensure_pd(Sigma)
        diffs = data - mu  # (n, dim)
        # Mahalanobis via the pre-inverted Cholesky factor: one (dim, dim)
        # triangular solve + an MXU matmul instead of a per-point
        # substitution chain over n (see cluster._log_gauss).
        L_inv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(dim, dtype=L.dtype), lower=True
        )
        sol = diffs @ L_inv.T  # (n, dim)
        delta = jnp.sum(sol * sol, axis=1)  # (n,)

        nu_new = _opt_nu(delta, dim, 1.0 / n)
        now_inf = ~jnp.isfinite(nu_new)

        w = (nu_new + dim) / (nu_new + delta)  # (n,)
        Sigma_new = (diffs.T * w) @ diffs / n
        mu_new = jnp.sum(w[:, None] * data, axis=0) / jnp.sum(w)

        # On the Gaussian-limit exit the reference returns the *current*
        # (mu, Sigma) before this iteration's M-step (student.py:92-94).
        mu_out = jnp.where(now_inf, mu, mu_new)
        Sigma_out = jnp.where(now_inf, Sigma, Sigma_new)
        return (mu_out, Sigma_out, nu_new, nu, i + 1, now_inf)

    init = (mu0, Sigma0, nu0, jnp.asarray(0.0, fdtype), jnp.asarray(0, jnp.int32), jnp.asarray(False))
    mu, Sigma, nu, _, _, _ = jax.lax.while_loop(cond, body, init)

    Sigma, _ = _ensure_pd(Sigma)
    return mu, Sigma, nu


def _weighted_median_presorted(
    d_sorted: jnp.ndarray, order: jnp.ndarray, wbar: jnp.ndarray
) -> jnp.ndarray:
    """Weighted median given the per-dimension sort of the data.

    `d_sorted`/`order` are `jnp.sort/argsort(data, axis=0)`. Splitting the
    sort out lets callers that fit MANY weightings of the SAME points
    (the per-mode fits: one shared data array, per-mode weights) pay for
    the d column sorts once instead of once per mode."""
    w_sorted = wbar[order]  # (n, d)
    cum = jnp.cumsum(w_sorted, axis=0)
    # first index with cumulative weight >= 1/2
    idx = jnp.argmax(cum >= 0.5 - 1e-7, axis=0)  # (d,)
    return jnp.take_along_axis(d_sorted, idx[None, :], axis=0)[0]


def _weighted_median(data: jnp.ndarray, wbar: jnp.ndarray) -> jnp.ndarray:
    """Per-dimension weighted median of (n, d) data with normalized weights.

    Reduces to the (lower) sample median at uniform weights — the robust
    location init the reference uses (student.py:60)."""
    order = jnp.argsort(data, axis=0)  # (n, d)
    return _weighted_median_presorted(
        jnp.take_along_axis(data, order, axis=0), order, wbar
    )


@jax.jit
def fit_mvstud_weighted(
    data: jnp.ndarray,
    weights: jnp.ndarray,
    tolerance: float = 1e-6,
    max_iter: int = 100,
    sort_cache=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted multivariate Student-t EM. data (n, dim), weights (n,).

    Sufficient-statistics generalization of `fit_mvstud`: every sample mean
    in the EM (the E-step responsibilities, the mu/Sigma M-steps, and the
    digamma stationarity equation of the nu M-step) becomes a weighted mean
    under the normalized `weights`. At uniform weights this reproduces
    `fit_mvstud` exactly; for importance-weighted particles it fits the
    same target the reference approaches by resampling each cluster to 4x
    its member count and fitting unweighted (modes.py:196-205) — without
    the resampling noise and without materializing the enlarged sample.

    Returns (mu, Sigma, nu); nu == +inf signals the Gaussian limit.
    `sort_cache`, if given, is `(jnp.sort(data, axis=0),
    jnp.argsort(data, axis=0))` — callers fitting many weightings of the
    same points (modes.fit_mode_statistics) precompute it once so the
    median init's column sorts are not repeated per mode.
    """
    data = jnp.asarray(data)
    weights = jnp.asarray(weights, data.dtype)
    n, dim = data.shape
    fdtype = data.dtype

    total = jnp.sum(weights)
    wbar = weights / jnp.where(total > 0, total, 1.0)  # (n,), sums to 1
    # Effective sample count: plays n's role in the covariance-ridge init.
    n_eff = 1.0 / jnp.maximum(jnp.sum(wbar * wbar), jnp.finfo(fdtype).tiny)

    if sort_cache is None:
        mu0 = _weighted_median(data, wbar)
    else:
        mu0 = _weighted_median_presorted(sort_cache[0], sort_cache[1], wbar)
    wmean = jnp.sum(wbar[:, None] * data, axis=0)
    xc = data - wmean
    cov_w = (xc.T * wbar) @ xc
    var_w = jnp.sum(wbar[:, None] * xc * xc, axis=0)
    Sigma0 = cov_w + jnp.diag(var_w) / n_eff
    nu0 = jnp.asarray(20.0, fdtype)

    def cond(carry):
        mu, Sigma, nu, last_nu, i, hit_inf = carry
        return (~_nu_converged(nu, last_nu, tolerance)) & (i < max_iter) & (~hit_inf)

    def body(carry):
        mu, Sigma, nu, last_nu, i, hit_inf = carry
        Sigma, L = _ensure_pd(Sigma)
        diffs = data - mu  # (n, dim)
        # Mahalanobis via the pre-inverted Cholesky factor: one (dim, dim)
        # triangular solve + an MXU matmul instead of a per-point
        # substitution chain over n (see cluster._log_gauss).
        L_inv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(dim, dtype=L.dtype), lower=True
        )
        sol = diffs @ L_inv.T  # (n, dim)
        delta = jnp.sum(sol * sol, axis=1)  # (n,)

        nu_new = _opt_nu(delta, dim, wbar)
        now_inf = ~jnp.isfinite(nu_new)

        g = (nu_new + dim) / (nu_new + delta)  # (n,) E-step scale
        wg = wbar * g
        Sigma_new = (diffs.T * wg) @ diffs  # sum wbar_i g_i d d^T (sum wbar = 1)
        mu_new = jnp.sum(wg[:, None] * data, axis=0) / jnp.sum(wg)

        mu_out = jnp.where(now_inf, mu, mu_new)
        Sigma_out = jnp.where(now_inf, Sigma, Sigma_new)
        return (mu_out, Sigma_out, nu_new, nu, i + 1, now_inf)

    init = (mu0, Sigma0, nu0, jnp.asarray(0.0, fdtype), jnp.asarray(0, jnp.int32), jnp.asarray(False))
    mu, Sigma, nu, _, _, _ = jax.lax.while_loop(cond, body, init)

    Sigma, _ = _ensure_pd(Sigma)
    return mu, Sigma, nu
