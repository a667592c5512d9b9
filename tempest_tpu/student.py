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
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

_REG_FLOOR = 1e-6
_NU_LOG_LO = -69.0  # log(1e-30)
_NU_LOG_HI = 69.0  # log(1e30)
# 45 halvings of the 138-log-unit bracket -> ~4e-12 relative nu precision,
# beyond float32 resolution (the reference's scipy bisect targets 2e-12
# absolute; the fitted root agrees to float precision).
_NU_BISECT_ITERS = 45


def _ensure_pd(Sigma: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Regularize Sigma if Cholesky fails; return (Sigma, chol)."""
    d = Sigma.shape[0]
    L = jnp.linalg.cholesky(Sigma)
    bad = ~jnp.all(jnp.isfinite(L))
    reg = jnp.maximum(_REG_FLOOR, _REG_FLOOR * jnp.abs(jnp.trace(Sigma)))
    Sigma2 = jnp.where(bad, Sigma + jnp.eye(d, dtype=Sigma.dtype) * reg, Sigma)
    L2 = jnp.where(bad, jnp.linalg.cholesky(Sigma2), L)
    return Sigma2, L2


def _nu_objective(log_nu, delta, dim, n):
    """Digamma stationarity equation of the nu M-step (student.py:40-52)."""
    nu = jnp.exp(log_nu)
    w = (nu + dim) / (nu + delta)
    return (
        -digamma(nu / 2.0)
        + jnp.log(nu / 2.0)
        + jnp.sum(jnp.log(w)) / n
        - jnp.sum(w) / n
        + 1.0
        + digamma((nu + dim) / 2.0)
        - jnp.log((nu + dim) / 2.0)
    )


def _opt_nu(delta: jnp.ndarray, dim: int, n: int) -> jnp.ndarray:
    """Solve for nu; returns +inf when the Gaussian limit is optimal."""
    f_hi = _nu_objective(jnp.asarray(_NU_LOG_HI, delta.dtype), delta, dim, n)
    is_inf = f_hi >= 0.0

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        fm = _nu_objective(mid, delta, dim, n)
        # f decreases from +inf at nu->0 to f_hi < 0: root keeps sign change
        lo = jnp.where(fm > 0.0, mid, lo)
        hi = jnp.where(fm > 0.0, hi, mid)
        return lo, hi

    lo0 = jnp.asarray(_NU_LOG_LO, delta.dtype)
    hi0 = jnp.asarray(_NU_LOG_HI, delta.dtype)
    lo, hi = jax.lax.fori_loop(0, _NU_BISECT_ITERS, body, (lo0, hi0))
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
        # Reference convergence is |nu_prev - nu| > 1e-6 absolute
        # (student.py:71); under float32 an absolute 1e-6 never triggers for
        # nu >> 1, so the tolerance is additionally scaled by |nu| — the
        # fitted distribution is identical to well below sampling noise.
        tol = tolerance * jnp.maximum(1.0, jnp.abs(nu))
        return (jnp.abs(last_nu - nu) > tol) & (i < max_iter) & (~hit_inf)

    def body(carry):
        mu, Sigma, nu, last_nu, i, hit_inf = carry
        Sigma, L = _ensure_pd(Sigma)
        diffs = data - mu  # (n, dim)
        sol = jax.scipy.linalg.cho_solve((L, True), diffs.T)  # (dim, n)
        delta = jnp.sum(diffs.T * sol, axis=0)  # (n,)

        nu_new = _opt_nu(delta, dim, n)
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
