"""Weighted Gaussian-mixture EM and hierarchical BIC-gated clustering.

TPU redesign of /root/reference/tempest/cluster.py:5-696. The reference runs
per-leaf scipy EM fits in Python; here the weighted EM (k-means++ init,
responsibilities, M-step, lower bound, BIC) is a single jitted fixed-shape
program over masked data — a leaf is "sample_weight zeroed outside the
leaf", so leaf counts never change array shapes — and the top-down bisecting
split loop (fit K=1 vs K=2 per leaf, split when the BIC improvement beats
`threshold_modifier * n_params * log(N_eff)`) is host-orchestrated over
K_max padded leaf slots with all leaf fits batched in one `vmap`.

Semantics preserved (citations inline): k-means++ weighted init seeded
deterministically per fit (cluster.py:94-95 uses np.random.seed(42)),
responsibility normalization +1e-10 (cluster.py:191), covariance
regularization fallbacks (cluster.py:180-188), BIC free-parameter counts per
covariance type (cluster.py:310-340), min_points gating on both children
(cluster.py:497), optional [0,1] min-max normalization (cluster.py:377-405),
and mixture-posterior prediction with nearest-center fallback
(cluster.py:574-631).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .ops.tools import logsumexp

_EPS = 1e-10
_LOG2PI = float(np.log(2.0 * np.pi))


# ---------------------------------------------------------------------------
# Weighted Gaussian mixture EM (fixed shapes, masked by zero weights)
# ---------------------------------------------------------------------------
class GMMParams(NamedTuple):
    weights: jnp.ndarray  # (K,) mixture weights
    means: jnp.ndarray  # (K, d)
    covariances: jnp.ndarray  # (K, d, d) full representation
    lower_bound: jnp.ndarray  # () weighted log-likelihood bound
    n_iter: jnp.ndarray  # () int32


def _log_gauss(X, mean, cov, reg_covar):
    """Log N(X | mean, cov + reg*I) with identity fallback on failure.

    Parity: the try/except fallback of cluster.py:180-188 — XLA raises no
    exceptions, so a NaN Cholesky selects the identity-covariance branch.

    The Mahalanobis term is computed as (L^-1 diff) via a PRE-INVERTED
    Cholesky factor: one (d, d) triangular solve against the identity,
    then a dense (n, d) x (d, d) matmul that runs on the MXU. A per-point
    triangular solve (solve_triangular over an (d, n) RHS) lowers to a
    sequential substitution chain over n — measured as the dominant
    latency of every geometry stage (EM E-steps, BIC, prediction) at
    flagship shapes.
    """
    d = X.shape[1]
    eye = jnp.eye(d, dtype=X.dtype)
    cov_r = cov + eye * reg_covar
    L = jnp.linalg.cholesky(cov_r)
    ok = jnp.all(jnp.isfinite(L))
    L_safe = jnp.where(ok, L, jnp.sqrt(reg_covar) * eye)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_safe)))
    L_inv = jax.scipy.linalg.solve_triangular(L_safe, eye, lower=True)
    diff = X - mean
    sol = diff @ L_inv.T  # (n, d): rows are L^-1 (x - mean)
    maha = jnp.sum(sol * sol, axis=1)
    return -0.5 * (d * _LOG2PI + logdet + maha)


def _kmeanspp_init(key, X, sample_weight, n_components):
    """Weighted k-means++ seeding (cluster.py:135-158)."""
    n, d = X.shape

    def first(key):
        cumsum = jnp.cumsum(sample_weight)
        r = jax.random.uniform(key, ()) * cumsum[-1]
        return X[jnp.clip(jnp.searchsorted(cumsum, r), 0, n - 1)]

    keys = jax.random.split(key, n_components)
    means0 = jnp.zeros((n_components, d), dtype=X.dtype)
    means0 = means0.at[0].set(first(keys[0]))

    def add_center(k, means):
        d2 = jnp.sum((X[:, None, :] - means[None, :, :]) ** 2, axis=-1)  # (n, K)
        col_ids = jnp.arange(n_components)
        d2 = jnp.where(col_ids[None, :] < k, d2, jnp.inf)
        distances = jnp.min(d2, axis=1)
        probs = distances * sample_weight
        probs = probs / jnp.maximum(jnp.sum(probs), _EPS)
        cumsum = jnp.cumsum(probs)
        r = jax.random.uniform(keys[k], ()) * cumsum[-1]
        return means.at[k].set(X[jnp.clip(jnp.searchsorted(cumsum, r), 0, n - 1)])

    means0 = jax.lax.fori_loop(1, n_components, add_center, means0)

    # Initial soft responsibilities from distances. The reference uses a
    # UNIT kernel bandwidth (exp(-0.5*d2), cluster.py:160-165), which for
    # data at scale << 1 produces near-uniform responsibilities: the first
    # M-step then lands both components on the global mean — the symmetric
    # saddle of the EM objective — and symmetry breaking takes hundreds of
    # iterations (far past the 1e-3 bound tolerance), so bimodal data never
    # splits. Setting the bandwidth to the weighted mean squared distance
    # to the nearest chosen center makes the initial assignment decisive at
    # any data scale while reducing to the same behaviour for unit-scale
    # data.
    d2 = jnp.sum((X[:, None, :] - means0[None, :, :]) ** 2, axis=-1)  # (n, K)
    d2_min = jnp.min(d2, axis=1)
    h2 = jnp.sum(sample_weight * d2_min) / jnp.maximum(jnp.sum(sample_weight), _EPS)
    h2 = jnp.maximum(h2, _EPS)
    logits = -0.5 * (d2 - d2_min[:, None]) / h2
    resp = jnp.exp(logits)
    resp = resp / jnp.maximum(jnp.sum(resp, axis=1, keepdims=True), _EPS)
    return resp


def _m_step(X, resp, sample_weight, covariance_type: str):
    """Weighted M-step (cluster.py:195-250). Returns full-matrix covs."""
    n, d = X.shape
    wresp = resp * sample_weight[:, None]  # (n, K)
    nk = jnp.sum(wresp, axis=0)  # (K,)
    pi = nk / jnp.maximum(jnp.sum(nk), _EPS)
    means = (wresp.T @ X) / (nk[:, None] + _EPS)

    diff = X[:, None, :] - means[None, :, :]  # (n, K, d)
    if covariance_type == "full":
        covs = jnp.einsum("nk,nki,nkj->kij", wresp, diff, diff)
        covs = covs / (nk[:, None, None] + _EPS)
    elif covariance_type == "tied":
        # Deviation from the reference (cluster.py:227-232), which divides
        # the weight-normalized scatter by n_samples a second time and is
        # untested numerically (its test checks shapes only): normalize by
        # the total responsibility mass for a correct pooled covariance.
        tied = jnp.einsum("nk,nki,nkj->ij", wresp, diff, diff)
        tied = tied / jnp.maximum(jnp.sum(nk), _EPS)
        covs = jnp.broadcast_to(tied, (means.shape[0], d, d))
    elif covariance_type == "diag":
        var = jnp.einsum("nk,nki->ki", wresp, diff * diff) / (nk[:, None] + _EPS)
        covs = jax.vmap(jnp.diag)(var)
    elif covariance_type == "spherical":
        s = jnp.einsum("nk,nki->k", wresp, diff * diff) / (nk * d + _EPS)
        covs = s[:, None, None] * jnp.eye(d, dtype=X.dtype)[None]
    else:
        raise ValueError(f"Unknown covariance_type {covariance_type}")
    return pi, means, covs


def _e_step(X, pi, means, covs, reg_covar, sample_weight=None):
    """Responsibilities in linear space with +eps normalization
    (cluster.py:172-193).

    Also returns the weighted lower bound AT THESE PARAMETERS (free once
    the per-point likelihoods are in hand) so the EM loop needs a single
    `_log_gauss` chain per iteration instead of two — see `gmm_fit`.
    """
    log_probs = jax.vmap(lambda m, c: _log_gauss(X, m, c, reg_covar))(means, covs)
    probs = pi[:, None] * jnp.exp(log_probs)  # (K, n)
    lik = jnp.sum(probs, axis=0)  # (n,)
    resp = probs.T  # (n, K)
    resp = resp / (lik[:, None] + _EPS)
    lb = None
    if sample_weight is not None:
        lb = jnp.sum(sample_weight * jnp.log(lik + _EPS))
    return resp, lb


def _mixture_scores(X, pi, means, covs, reg_covar):
    """Per-point per-component log-densities and weighted mixture likelihood.

    `log_probs` (K, n) are the UNWEIGHTED component log-densities
    (`_log_gauss` output; no mixture weights) — callers that need weighted
    scores must add `log(pi + eps)` themselves. Only `lik` (n,) folds in
    the mixture weights: lik = sum_k pi_k * exp(log_probs_k).

    One density pass serves the lower bound, the BIC, and hard prediction;
    the split round reuses it instead of re-deriving `_log_gauss` chains
    for each consumer (the chains are the sequential-depth cost of the
    whole hierarchical fit on TPU).
    """
    log_probs = jax.vmap(lambda m, c: _log_gauss(X, m, c, reg_covar))(means, covs)
    lik = jnp.sum(pi[:, None] * jnp.exp(log_probs), axis=0)  # (n,)
    return log_probs, lik


def _lower_bound(X, pi, means, covs, sample_weight, reg_covar):
    """Weighted log-likelihood bound (cluster.py:264-283)."""
    _, lik = _mixture_scores(X, pi, means, covs, reg_covar)
    return jnp.sum(sample_weight * jnp.log(lik + _EPS))


def _gmm_fit_scores(
    key: jax.Array,
    X: jnp.ndarray,
    sample_weight: jnp.ndarray,
    n_components: int,
    covariance_type: str = "full",
    max_iter: int = 1000,
    tol: float = 1e-3,
    reg_covar: float = 1e-6,
    n_init: int = 1,
):
    """Weighted GMM EM returning (params, per-point (K, n) scores, (n,) lik).

    The scores are the weighted log-densities at the FINAL parameters —
    the same pass that produces the returned lower bound — so callers
    (BIC, hard prediction in the split round) reuse them instead of
    recomputing the density chain. See `gmm_fit` for semantics.
    """
    sw = sample_weight / jnp.maximum(jnp.sum(sample_weight), _EPS)

    def single_fit(key: jax.Array) -> GMMParams:
        resp0 = _kmeanspp_init(key, X, sw, n_components)
        pi0, means0, covs0 = _m_step(X, resp0, sw, covariance_type)

        def cond(c):
            return (~c["done"]) & (c["i"] < max_iter)

        def body(c):
            # One `_log_gauss` chain per iteration: the E-step's per-point
            # mixture likelihoods give the bound at the CURRENT params, so
            # convergence compares LB(theta_t) - LB(theta_{t-1}) — the same
            # monotone sequence the reference checks (cluster.py:103-118),
            # offset by one M-step (the reference recomputes the bound at
            # the post-M-step params with a second density pass, doubling
            # the per-iteration Cholesky/solve chain). Consequences, both
            # bounded by tol and documented as PARITY.md deviation 5: on
            # convergence we retain the PRE-M-step params where the
            # reference keeps post-M-step ones, and n_iter counts the
            # detection iteration (off by one vs the reference).
            resp, new_lb = _e_step(
                X, c["pi"], c["means"], c["covs"], reg_covar, sw
            )
            done = (new_lb - c["lb"]) < tol
            pi, means, covs = _m_step(X, resp, sw, covariance_type)
            pi = jnp.where(done, c["pi"], pi)
            means = jnp.where(done, c["means"], means)
            covs = jnp.where(done, c["covs"], covs)
            lb = jnp.where(done, c["lb"], new_lb)
            return {
                "pi": pi, "means": means, "covs": covs,
                "lb": lb, "i": c["i"] + 1, "done": done,
            }

        init = {
            "pi": pi0, "means": means0, "covs": covs0,
            "lb": jnp.asarray(-jnp.inf, X.dtype),
            "i": jnp.asarray(0, jnp.int32),
            "done": jnp.asarray(False),
        }
        out = jax.lax.while_loop(cond, body, init)
        # Reference keeps the last computed bound even when it triggered the
        # break (cluster.py:113-126 stores best over inits).
        log_probs, lik = _mixture_scores(
            X, out["pi"], out["means"], out["covs"], reg_covar
        )
        final_lb = jnp.sum(sw * jnp.log(lik + _EPS))
        params = GMMParams(
            weights=out["pi"],
            means=out["means"],
            covariances=out["covs"],
            lower_bound=final_lb,
            n_iter=out["i"],
        )
        return params, log_probs, lik

    if n_init <= 1:
        return single_fit(key)
    fits, log_probs, lik = jax.vmap(single_fit)(jax.random.split(key, n_init))
    best = jnp.argmax(jnp.nan_to_num(fits.lower_bound, nan=-jnp.inf))
    return (
        jax.tree_util.tree_map(lambda a: a[best], fits),
        log_probs[best],
        lik[best],
    )


@partial(jax.jit, static_argnames=("n_components", "covariance_type", "max_iter", "n_init"))
def gmm_fit(
    key: jax.Array,
    X: jnp.ndarray,
    sample_weight: jnp.ndarray,
    n_components: int,
    covariance_type: str = "full",
    max_iter: int = 1000,
    tol: float = 1e-3,
    reg_covar: float = 1e-6,
    n_init: int = 1,
) -> GMMParams:
    """Fit a weighted GMM by EM; zero-weight samples are ignored.

    n_init > 1 runs that many independently-seeded EM fits (vmapped, so all
    restarts execute as one batched program) and keeps the one with the best
    weighted lower bound — parity with the reference's restart loop
    (cluster.py:97-131).
    """
    params, _, _ = _gmm_fit_scores(
        key, X, sample_weight, n_components, covariance_type,
        max_iter, tol, reg_covar, n_init,
    )
    return params


def _single_component_fit_scores(
    X: jnp.ndarray,
    sample_weight: jnp.ndarray,
    covariance_type: str = "full",
    reg_covar: float = 1e-6,
):
    """Exact K=1 weighted 'GMM' fit — one closed-form M-step.

    For a single component the EM fixed point is reached immediately
    (responsibilities are identically 1, so the first M-step is the MLE
    and every subsequent iteration reproduces it); `gmm_fit(..., 1, ...)`
    returns exactly this after its convergence check. The hierarchical
    splitter evaluates a K=1 fit for every leaf every round, so skipping
    the k-means++ init and the while_loop there removes most of its
    sequential depth. Returns (params, (n,) per-point likelihood) so the
    BIC reuses the bound's density pass."""
    sw = sample_weight / jnp.maximum(jnp.sum(sample_weight), _EPS)
    resp = jnp.ones((X.shape[0], 1), dtype=X.dtype)
    pi, means, covs = _m_step(X, resp, sw, covariance_type)
    _, lik = _mixture_scores(X, pi, means, covs, reg_covar)
    lb = jnp.sum(sw * jnp.log(lik + _EPS))
    params = GMMParams(
        weights=pi,
        means=means,
        covariances=covs,
        lower_bound=lb,
        n_iter=jnp.asarray(1, jnp.int32),
    )
    return params, lik


def _single_component_fit(
    X: jnp.ndarray,
    sample_weight: jnp.ndarray,
    covariance_type: str = "full",
    reg_covar: float = 1e-6,
) -> GMMParams:
    return _single_component_fit_scores(X, sample_weight, covariance_type, reg_covar)[0]


def _single_component_params(
    X: jnp.ndarray,
    sample_weight: jnp.ndarray,
    covariance_type: str = "full",
) -> GMMParams:
    """K=1 closed-form M-step WITHOUT the density pass for the bound.

    For callers that re-evaluate the density at these parameters on a
    different point set anyway (the subset split round, the final refit),
    computing the subset lower bound here would be a wasted Cholesky/solve
    chain; lower_bound is returned as 0 and must not be consumed.
    """
    sw = sample_weight / jnp.maximum(jnp.sum(sample_weight), _EPS)
    resp = jnp.ones((X.shape[0], 1), dtype=X.dtype)
    pi, means, covs = _m_step(X, resp, sw, covariance_type)
    return GMMParams(
        weights=pi,
        means=means,
        covariances=covs,
        lower_bound=jnp.asarray(0.0, X.dtype),
        n_iter=jnp.asarray(1, jnp.int32),
    )


def _bic_from_lik(
    lik: jnp.ndarray,
    mask: jnp.ndarray,
    n_components: int,
    n_features: int,
    covariance_type: str,
) -> jnp.ndarray:
    """BIC from a precomputed per-point mixture likelihood.

    Same statistic as `gmm_bic` (uniform 1/n_leaf weights over the leaf
    members, n_samples = n_leaf; per-type free-parameter counts of
    cluster.py:310-340) without re-running the density chain.
    """
    d, K = n_features, n_components
    if covariance_type == "full":
        cov_params = K * d * (d + 1) / 2
    elif covariance_type == "tied":
        cov_params = d * (d + 1) / 2
    elif covariance_type == "diag":
        cov_params = K * d
    elif covariance_type == "spherical":
        cov_params = K
    else:
        raise ValueError(f"Unknown covariance_type {covariance_type}")
    n_parameters = (K - 1) + K * d + cov_params
    n_leaf = jnp.sum(mask).astype(lik.dtype)
    ll = jnp.sum(jnp.where(mask, jnp.log(lik + _EPS), 0.0))
    return -2.0 * ll + n_parameters * jnp.log(jnp.maximum(n_leaf, 1.0))


def gmm_predict(params: GMMParams, X: jnp.ndarray, reg_covar: float = 1e-6) -> jnp.ndarray:
    """Hard assignment by max posterior (cluster.py:285-308)."""
    log_probs = jax.vmap(
        lambda m, c: _log_gauss(X, m, c, reg_covar)
    )(params.means, params.covariances)  # (K, n)
    scores = jnp.log(params.weights + _EPS)[:, None] + log_probs
    return jnp.argmax(scores, axis=0).astype(jnp.int32)


def gmm_bic(
    params: GMMParams,
    X: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    covariance_type: str = "full",
    reg_covar: float = 1e-6,
) -> jnp.ndarray:
    """BIC with per-type free-parameter counts (cluster.py:310-340).

    `mask` selects the leaf members; the reference evaluates BIC on the leaf
    data with uniform weights 1/n_leaf and n_samples = n_leaf.
    """
    n, d = X.shape
    K = params.means.shape[0]
    if covariance_type == "full":
        cov_params = K * d * (d + 1) / 2
    elif covariance_type == "tied":
        cov_params = d * (d + 1) / 2
    elif covariance_type == "diag":
        cov_params = K * d
    elif covariance_type == "spherical":
        cov_params = K
    n_parameters = (K - 1) + K * d + cov_params

    if mask is None:
        n_leaf = jnp.asarray(float(n), X.dtype)
        uw = jnp.full((n,), 1.0 / n, dtype=X.dtype)
    else:
        n_leaf = jnp.sum(mask).astype(X.dtype)
        uw = jnp.where(mask, 1.0 / jnp.maximum(n_leaf, 1.0), 0.0)

    ll = _lower_bound(X, params.weights, params.means, params.covariances, uw, reg_covar)
    ll = ll * n_leaf
    return -2.0 * ll + n_parameters * jnp.log(jnp.maximum(n_leaf, 1.0))


class GaussianMixture:
    """Standalone weighted-GMM facade over `gmm_fit`/`gmm_predict`/`gmm_bic`.

    API-surface parity with the reference's public class
    (/root/reference/tempest/cluster.py:5-340): same constructor keywords,
    `fit(X, sample_weight)` returning self, `predict(X)`, `bic(X)`, and the
    fitted attributes `weights_`/`means_`/`covariances_`/`converged_`/
    `n_iter_`/`lower_bound_`. The EM itself is the same single jitted
    device program the hierarchical clusterer uses (vmapped n_init
    restarts, k-means++ init, all four covariance types).

    One representational difference: `covariances_` is always returned as
    (K, d, d) full matrices — tied/diag/spherical fits constrain the EM
    updates but store the expanded matrix (the reference stores per-type
    compressed shapes). `bic()` still counts the per-type free parameters.
    """

    def __init__(
        self,
        n_components: int = 1,
        covariance_type: str = "full",
        max_iter: int = 1000,
        n_init: int = 1,
        tol: float = 1e-3,
        reg_covar: float = 1e-6,
        random_state: Optional[int] = None,
    ):
        if covariance_type not in ("full", "tied", "diag", "spherical"):
            raise ValueError(
                "covariance_type must be one of 'full', 'tied', 'diag', "
                f"'spherical'; got {covariance_type!r}"
            )
        self.n_components = int(n_components)
        self.covariance_type = covariance_type
        self.max_iter = int(max_iter)
        self.n_init = int(n_init)
        self.tol = float(tol)
        self.reg_covar = float(reg_covar)
        self.random_state = random_state

        self.weights_ = None
        self.means_ = None
        self.covariances_ = None
        self.converged_ = False
        self.n_iter_ = 0
        self.lower_bound_ = None
        self._params: Optional[GMMParams] = None

    def fit(self, X, sample_weight=None) -> "GaussianMixture":
        """Fit the weighted GMM; returns self (cluster.py:56-133)."""
        X = jnp.asarray(X)
        n = X.shape[0]
        if sample_weight is None:
            sample_weight = jnp.ones((n,), dtype=X.dtype)
        else:
            sample_weight = jnp.asarray(sample_weight, dtype=X.dtype)
        key = jax.random.key(0 if self.random_state is None else self.random_state)
        params = gmm_fit(
            key,
            X,
            sample_weight,
            self.n_components,
            covariance_type=self.covariance_type,
            max_iter=self.max_iter,
            tol=self.tol,
            reg_covar=self.reg_covar,
            n_init=self.n_init,
        )
        self._params = params
        self.weights_ = np.asarray(params.weights)
        self.means_ = np.asarray(params.means)
        self.covariances_ = np.asarray(params.covariances)
        self.n_iter_ = int(params.n_iter)
        self.converged_ = self.n_iter_ < self.max_iter
        self.lower_bound_ = float(params.lower_bound)
        return self

    def _require_fitted(self):
        if self._params is None:
            raise ValueError("GaussianMixture is not fitted; call fit() first.")

    def predict(self, X) -> np.ndarray:
        """Hard labels by max posterior (cluster.py:285-308)."""
        self._require_fitted()
        return np.asarray(
            gmm_predict(self._params, jnp.asarray(X), reg_covar=self.reg_covar)
        )

    def bic(self, X) -> float:
        """BIC with per-type free-parameter counts (cluster.py:310-340)."""
        self._require_fitted()
        return float(
            gmm_bic(
                self._params,
                jnp.asarray(X),
                covariance_type=self.covariance_type,
                reg_covar=self.reg_covar,
            )
        )


# ---------------------------------------------------------------------------
# Hierarchical (bisecting) clustering with BIC gate
# ---------------------------------------------------------------------------
@struct.dataclass
class ClusterModel:
    """Fitted hierarchical clustering, ready for on-device prediction.

    `chol_inv`/`logdet` are the PRE-DECOMPOSED scoring factors of the
    (regularized) covariances in prediction space (normalized coordinates
    when `normalize`, original otherwise), computed once at fit time:
    per-call Cholesky + triangular-solve chains were the measured latency
    of `cluster_predict` (each lowers to ~d sequential substitution steps
    per call), and prediction runs 2-3x per PS iteration.
    """

    centers: jnp.ndarray  # (K_max, d) in ORIGINAL coordinates
    covariances: jnp.ndarray  # (K_max, d, d) in ORIGINAL coordinates
    weights: jnp.ndarray  # (K_max,) cluster weight fractions
    k_mask: jnp.ndarray  # (K_max,) valid-cluster mask
    data_min: jnp.ndarray  # (d,) normalization bounds (ignored if not normalize)
    data_max: jnp.ndarray  # (d,)
    chol_inv: jnp.ndarray  # (K_max, d, d) L^-1 of prediction-space cov + reg
    logdet: jnp.ndarray  # (K_max,) log|prediction-space cov + reg|
    normalize: bool = struct.field(pytree_node=False, default=False)

    @property
    def k_max(self) -> int:
        return self.centers.shape[0]

    def n_clusters(self) -> jnp.ndarray:
        return jnp.sum(self.k_mask)


def _chol_inv_logdet(cov: jnp.ndarray, reg_covar: float):
    """(L^-1, log|cov + reg I|) with the exact `_log_gauss` fallback
    semantics (NaN Cholesky -> sqrt(reg)*I factor). cov: (d, d)."""
    d = cov.shape[0]
    eye = jnp.eye(d, dtype=cov.dtype)
    L = jnp.linalg.cholesky(cov + eye * reg_covar)
    ok = jnp.all(jnp.isfinite(L))
    L_safe = jnp.where(ok, L, jnp.sqrt(reg_covar) * eye)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_safe)))
    L_inv = jax.scipy.linalg.solve_triangular(L_safe, eye, lower=True)
    return L_inv, logdet


def single_cluster_model(
    n_dim: int, k_max: int, dtype=jnp.float32, normalize: bool = False
) -> ClusterModel:
    """Trivial one-cluster model (clustering disabled / not yet fitted).

    `normalize` is static pytree metadata on ClusterModel; a placeholder
    carried through `lax.cond` against a fitted model must be built with
    the same flag or the branch pytrees mismatch.
    """
    eye = jnp.broadcast_to(jnp.eye(n_dim, dtype=dtype), (k_max, n_dim, n_dim))
    chol_inv, logdet = jax.vmap(lambda c: _chol_inv_logdet(c, 1e-6))(eye)
    return ClusterModel(
        centers=jnp.zeros((k_max, n_dim), dtype=dtype),
        covariances=eye,
        weights=jnp.where(jnp.arange(k_max) < 1, 1.0, 0.0).astype(dtype),
        k_mask=jnp.arange(k_max) < 1,
        data_min=jnp.zeros((n_dim,), dtype=dtype),
        data_max=jnp.ones((n_dim,), dtype=dtype),
        chol_inv=chol_inv,
        logdet=logdet,
        normalize=normalize,
    )


def _predict_scores(model: ClusterModel, X: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(scores (K, n), Xn, centers_n) using the fit-time decompositions.

    Same math as scoring `_log_gauss(Xn, center, cov_n, 1e-6)` per cluster
    (cluster.py:574-600 / 633-696 in the reference) but with the Cholesky
    inversion hoisted to fit time (ClusterModel.chol_inv/logdet): per call
    this is K dense (n, d) x (d, d) matmuls — no decomposition chains.
    """
    scale = model.data_max - model.data_min + _EPS
    if model.normalize:
        Xn = (X - model.data_min) / scale
        centers = (model.centers - model.data_min) / scale
    else:
        Xn = X
        centers = model.centers
    d = X.shape[1]

    def score_k(mean, L_inv, logdet, weight, valid):
        sol = (Xn - mean) @ L_inv.T  # (n, d)
        maha = jnp.sum(sol * sol, axis=1)
        lp = -0.5 * (d * _LOG2PI + logdet + maha) + jnp.log(weight + _EPS)
        return jnp.where(valid, lp, -jnp.inf)

    scores = jax.vmap(score_k)(
        centers, model.chol_inv, model.logdet, model.weights, model.k_mask
    )  # (K, n)
    return scores, Xn, centers


@partial(jax.jit, static_argnames=())
def cluster_predict(model: ClusterModel, X: jnp.ndarray) -> jnp.ndarray:
    """Mixture-posterior assignment with nearest-center fallback.

    Parity: cluster.py:574-600 / 633-696 — per-cluster Gaussian logpdf in
    normalized coordinates with 1e-6 regularization; rows whose mixture
    score is non-finite fall back to nearest center.
    """
    scores, Xn, centers = _predict_scores(model, X)
    best = jnp.argmax(scores, axis=0).astype(jnp.int32)

    # Nearest-center fallback for non-finite scores
    d2 = jnp.sum((Xn[:, None, :] - centers[None, :, :]) ** 2, axis=-1)  # (n, K)
    d2 = jnp.where(model.k_mask[None, :], d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=1).astype(jnp.int32)
    bad = ~jnp.isfinite(jnp.max(scores, axis=0))
    return jnp.where(bad, nearest, best)


def cluster_predict_proba(model: ClusterModel, X: jnp.ndarray) -> jnp.ndarray:
    """Mixture posterior probabilities (cluster.py:602-631)."""
    scores, _, _ = _predict_scores(model, X)
    norm = logsumexp(scores, axis=0, keepdims=True)
    return jnp.exp(scores - norm).T  # (n, K)


@partial(
    jax.jit,
    static_argnames=("k_max", "covariance_type", "n_init", "n_sub", "k_slots"),
)
def _split_round(
    key: jax.Array,
    Xw: jnp.ndarray,
    sample_weight: jnp.ndarray,
    labels: jnp.ndarray,  # (n,) int32; -1 = invalid
    n_leaves: jnp.ndarray,  # () int32
    min_points: jnp.ndarray,  # () int32
    threshold_modifier: float,
    k_max: int,
    covariance_type: str,
    n_init: int = 1,
    n_sub: Optional[int] = None,
    k_slots: Optional[int] = None,
):
    """Evaluate the K=1 vs K=2 split candidate for EVERY leaf in one program.

    All leaf fits are vmapped over the padded leaf axis (a leaf is its
    weight mask, so shapes are static); the split decision data — BIC
    improvements, thresholds, child labels and child member counts — come
    back in one transfer, so the host pays ONE device round-trip per split
    round instead of several per leaf (the tunnel makes round-trips the
    dominant cost of the clustered path).

    `n_sub` (static) bounds the PER-LEAF fit set: each leaf's EM runs on
    its own top-n_sub members BY WEIGHT — (k_max, n_sub) tensors instead
    of (k_max, n), which is where the round's HBM traffic lives — while
    the BIC gate and the child assignment are evaluated on the FULL
    membership with one density pass at the final parameters. Leaves with
    <= n_sub members fit on exactly their member set (zero-weight padding
    rows are inert in the weighted EM): the closed-form K=1 fit is then
    IDENTICAL to the full-width fit, while the K=2 fit is statistically
    equivalent rather than bit-identical — top_k reorders the rows, so the
    k-means++ init's inverse-CDF uniform draw lands on a different (equally
    distributed) point. Larger leaves drop only their lowest-weight tail,
    the same truncation (and rationale) as the global train_max_points
    selection.

    `k_slots` (static, default k_max) bounds how many leaf SLOTS this round
    evaluates. Round r of the bisecting tree can hold at most 2^r leaves,
    so processing all k_max padded slots wastes a k_max/2^r factor of the
    round's HBM traffic; a caller that guarantees n_leaves <= k_slots gets
    bit-identical split decisions (slots >= n_leaves are never eligible)
    at k_slots/k_max of the cost. Leaf i's RNG key is split from the full
    k_max fan regardless, so fits do not depend on k_slots.
    """
    n, d = Xw.shape
    if k_slots is None:
        k_slots = k_max
    leaf_ids = jnp.arange(k_slots)
    members = labels[None, :] == leaf_ids[:, None]  # (k_slots, n)
    leaf_w = jnp.where(members, sample_weight[None, :], 0.0)  # (k_slots, n)
    w_tot = jnp.sum(leaf_w, axis=1)
    n_members = jnp.sum(members, axis=1)

    # threshold = modifier * n_params * log(N_eff) (cluster.py:407-418)
    w_norm = leaf_w / jnp.maximum(w_tot, _EPS)[:, None]
    n_eff = 1.0 / jnp.maximum(jnp.sum(w_norm**2, axis=1), _EPS)
    n_params = d + d * (d + 1) / 2 + 1
    thresholds = threshold_modifier * n_params * jnp.log(jnp.maximum(n_eff, 1.0))

    keys = jax.random.split(key, k_max)[:k_slots]
    # One density pass per fit: the K=1/K=2 fits return the per-point
    # likelihoods (and K=2 the per-component scores) evaluated at their
    # final parameters, which the BIC gates and the child prediction
    # consume directly — the reference re-runs the density chain for
    # `bic()` and `predict()` after each `fit()` (cluster.py:468,477,493).
    if n_sub is not None and n_sub < n:
        w_sub, sub_idx = jax.lax.top_k(leaf_w, n_sub)  # (k_max, n_sub)
        X_sub = Xw[sub_idx]  # (k_max, n_sub, d)
        p1 = jax.vmap(
            lambda Xs, w: _single_component_params(Xs, w, covariance_type)
        )(X_sub, w_sub)
        p2 = jax.vmap(
            lambda k, Xs, w: _gmm_fit_scores(
                k, Xs, w, 2, covariance_type, n_init=n_init
            )[0]
        )(keys, X_sub, w_sub)
        # Full-membership density pass at the subset-fitted parameters:
        # feeds the BIC gates (full-member likelihoods) and the child
        # labels for relabeling every member.
        _, lik1 = jax.vmap(
            lambda p: _mixture_scores(
                Xw, p.weights, p.means, p.covariances, 1e-6
            )
        )(p1)
        scores2, lik2 = jax.vmap(
            lambda p: _mixture_scores(
                Xw, p.weights, p.means, p.covariances, 1e-6
            )
        )(p2)
    else:
        p1, lik1 = jax.vmap(
            lambda w: _single_component_fit_scores(Xw, w, covariance_type)
        )(leaf_w)
        p2, scores2, lik2 = jax.vmap(
            lambda k, w: _gmm_fit_scores(k, Xw, w, 2, covariance_type, n_init=n_init)
        )(keys, leaf_w)
    d_feat = Xw.shape[1]
    bic1 = jax.vmap(
        lambda l, m: _bic_from_lik(l, m, 1, d_feat, covariance_type)
    )(lik1, members)
    bic2 = jax.vmap(
        lambda l, m: _bic_from_lik(l, m, 2, d_feat, covariance_type)
    )(lik2, members)
    improvement = bic1 - bic2

    # Hard assignment by max posterior, reusing the fit's scores
    # (== gmm_predict(p2, Xw), cluster.py:285-308)
    child = jnp.argmax(
        jnp.log(p2.weights + _EPS)[:, :, None] + scores2, axis=1
    ).astype(jnp.int32)  # (k_max, n)
    c0 = jnp.sum(members & (child == 0), axis=1)
    c1 = jnp.sum(members & (child == 1), axis=1)

    eligible = (
        (leaf_ids < n_leaves)
        & (n_members >= min_points)
        & (w_tot > 0.0)
        & (improvement > thresholds)
        & (c0 >= min_points)
        & (c1 >= min_points)
    )
    return {
        "improvement": jnp.where(eligible, improvement, -jnp.inf),
        "child": child.astype(jnp.int8),
        "eligible": eligible,
    }


@partial(
    jax.jit,
    static_argnames=(
        "k_max", "covariance_type", "max_rounds", "normalize", "n_init",
        "split_all", "leaf_fit_points",
    ),
)
def hgm_fit(
    key: jax.Array,
    X: jnp.ndarray,
    sample_weight: jnp.ndarray,
    mask: jnp.ndarray,
    min_points: jnp.ndarray,  # () int32
    threshold_modifier: jnp.ndarray,  # () float
    k_max: int,
    covariance_type: str,
    max_rounds: int,
    normalize: bool,
    n_init: int = 1,
    split_all: bool = False,
    leaf_fit_points: Optional[int] = None,
):
    """The ENTIRE hierarchical fit as one device program.

    The bisecting loop (cluster.py:445-521 in the reference) runs as a
    `lax.while_loop`: each round evaluates every leaf's K=1 vs K=2 split
    candidate (vmapped over the padded leaf axis), splits the
    best-improvement eligible leaf, and stops when nothing is eligible or
    K reaches k_max. Zero host round-trips — on a tunneled backend the
    transfers (child-label matrices, normalized data) previously dominated
    the clustered path's wall clock.

    `leaf_fit_points` (static) caps each leaf's EM fit set to its top-k
    members by weight (see _split_round); None fits every leaf on the
    full masked arrays.

    Returns (model, labels, n_leaves), all device values.
    """
    n, d = X.shape
    dtype = X.dtype
    sw = jnp.where(mask, sample_weight, 0.0)

    # Normalization bounds over valid rows (cluster.py:436-439)
    if normalize:
        inf = jnp.asarray(jnp.inf, dtype)
        data_min = jnp.min(jnp.where(mask[:, None], X, inf), axis=0)
        data_max = jnp.max(jnp.where(mask[:, None], X, -inf), axis=0)
        Xw = (X - data_min) / (data_max - data_min + _EPS)
    else:
        data_min = jnp.zeros((d,), dtype=dtype)
        data_max = jnp.ones((d,), dtype=dtype)
        Xw = X

    labels0 = jnp.where(mask, 0, -1).astype(jnp.int32)

    def round_step(c, k_slots):
        out = _split_round(
            key, Xw, sw, c["labels"], c["n_leaves"], min_points,
            threshold_modifier, k_max, covariance_type, n_init,
            leaf_fit_points, k_slots,
        )
        if split_all:
            # Split EVERY eligible leaf this round (standard bisecting
            # k-means cadence): the tree reaches K leaves in ~log2(K)
            # rounds instead of K-1, and each round's cost is the same
            # fixed-shape vmapped program. Eligible leaves take new slots
            # in leaf-id order; any that would overflow k_max wait for
            # the next round (and are re-gated then).
            elig = out["eligible"]
            rank = jnp.cumsum(elig.astype(jnp.int32)) - 1  # (k_slots,)
            new_ids = c["n_leaves"] + rank
            can = elig & (new_ids < k_max)
            lab = c["labels"]
            safe = jnp.clip(lab, 0, k_slots - 1)
            n = lab.shape[0]
            sample_child = out["child"].astype(jnp.int32)[safe, jnp.arange(n)]
            # `lab < k_slots` guards label slots beyond this round's
            # evaluated width (never populated when the caller's
            # n_leaves <= k_slots invariant holds; belt-and-braces).
            move = (lab >= 0) & (lab < k_slots) & can[safe] & (sample_child == 1)
            new_labels = jnp.where(move, new_ids[safe], lab)
            n_split = jnp.sum(can).astype(jnp.int32)
            return {
                "labels": new_labels,
                "n_leaves": c["n_leaves"] + n_split,
                "go": n_split > 0,
                "round": c["round"] + 1,
            }
        any_elig = jnp.any(out["eligible"])
        leaf = jnp.argmax(out["improvement"]).astype(jnp.int32)
        child_row = out["child"][leaf].astype(jnp.int32)  # (n,)
        # Children replace the parent: child 0 keeps the parent's slot,
        # child 1 takes the next free slot (reference's pop+extend
        # relabeling, cluster.py:508-509).
        members = c["labels"] == leaf
        new_labels = jnp.where(members & (child_row == 1), c["n_leaves"], c["labels"])
        return {
            "labels": jnp.where(any_elig, new_labels, c["labels"]),
            "n_leaves": c["n_leaves"] + any_elig.astype(jnp.int32),
            "go": any_elig,
            "round": c["round"] + 1,
        }

    state = {
        "labels": labels0,
        "n_leaves": jnp.asarray(1, jnp.int32),
        "go": jnp.asarray(True),
        "round": jnp.asarray(0, jnp.int32),
    }

    prefix_rounds = []
    if split_all:
        # Unrolled DOUBLING PREFIX: round r can hold at most 2^r leaves
        # (split_all starts from one leaf and at most doubles per round),
        # so its candidate evaluation only needs 2^r of the k_max padded
        # slots. Unrolling these rounds with k_slots = 2^r cuts the
        # dominant (k_slots, n) EM traffic of the whole hierarchical fit
        # by ~k_max*rounds / (2*k_max - 1); decisions are bit-identical
        # (slots >= n_leaves are never eligible, leaf RNG keys are
        # k_slots-independent). Skipped rounds (nothing left to split)
        # cost one lax.cond false branch.
        r = 0
        while (1 << r) < k_max and r < max_rounds:
            prefix_rounds.append(1 << r)
            r += 1
        for k_slots in prefix_rounds:
            state = jax.lax.cond(
                state["go"] & (state["n_leaves"] < k_max),
                partial(round_step, k_slots=k_slots),
                lambda c: c,
                state,
            )

    # Full-width tail: split trajectories that keep producing eligible
    # leaves past the doubling prefix (or the reference's one-split-per-
    # round cadence, split_all=False) continue under the original
    # while_loop semantics, bounded by max_rounds.
    if max_rounds > len(prefix_rounds) or not split_all:
        def cond(c):
            return c["go"] & (c["n_leaves"] < k_max) & (c["round"] < max_rounds)

        state = jax.lax.while_loop(
            cond, partial(round_step, k_slots=k_max), state
        )
    labels, n_leaves = state["labels"], state["n_leaves"]

    centers, covs, cweights = _final_refit(
        key, Xw, sw, labels, k_max, covariance_type, n_init
    )
    k_mask = jnp.arange(k_max) < n_leaves
    # Prediction-space (normalized-coordinate) covariances, padded to the
    # identity on invalid slots, are decomposed ONCE here; every later
    # cluster_predict call reuses the factors (see ClusterModel docstring).
    covs_pred = jnp.where(
        k_mask[:, None, None], covs, jnp.eye(d, dtype=dtype)[None]
    )
    chol_inv, logdet = jax.vmap(lambda c: _chol_inv_logdet(c, 1e-6))(covs_pred)
    if normalize:
        scale = data_max - data_min + _EPS
        centers = centers * scale[None, :] + data_min[None, :]
        covs = covs * (scale[:, None] * scale[None, :])[None]
    centers = jnp.where(k_mask[:, None], centers, 0.0)
    covs = jnp.where(
        k_mask[:, None, None], covs, jnp.eye(d, dtype=dtype)[None]
    )
    cweights = jnp.where(k_mask, cweights, 0.0)
    model = ClusterModel(
        centers=centers,
        covariances=covs,
        weights=cweights,
        k_mask=k_mask,
        data_min=data_min,
        data_max=data_max,
        chol_inv=chol_inv,
        logdet=logdet,
        normalize=normalize,
    )
    return model, labels, n_leaves


@partial(jax.jit, static_argnames=("k_max", "covariance_type", "n_init"))
def _final_refit(
    key: jax.Array,
    Xw: jnp.ndarray,
    sample_weight: jnp.ndarray,
    labels: jnp.ndarray,
    k_max: int,
    covariance_type: str,
    n_init: int = 1,
):
    """Per-leaf K=1 refits for centers/covariances, batched (cluster.py:527-556)."""
    n, d = Xw.shape
    leaf_ids = jnp.arange(k_max)
    members = labels[None, :] == leaf_ids[:, None]
    leaf_w = jnp.where(members, sample_weight[None, :], 0.0)
    # Params-only M-step: the refit consumes means/covariances only, so
    # the density pass behind the lower bound would be a wasted
    # (k_max, n) Cholesky/solve chain.
    p = jax.vmap(
        lambda w: _single_component_params(Xw, w, covariance_type)
    )(leaf_w)
    n_members = jnp.sum(members, axis=1)

    # Tiny leaves (< d members): plain mean + identity covariance
    mean_small = jnp.where(
        members[:, :, None], Xw[None, :, :], 0.0
    ).sum(axis=1) / jnp.maximum(n_members, 1)[:, None]
    centers = jnp.where((n_members >= d)[:, None], p.means[:, 0, :], mean_small)
    covs = jnp.where(
        (n_members >= d)[:, None, None],
        p.covariances[:, 0, :, :],
        jnp.broadcast_to(jnp.eye(d, dtype=Xw.dtype), (k_max, d, d)),
    )
    cweights = jnp.sum(leaf_w, axis=1) / jnp.maximum(jnp.sum(sample_weight), _EPS)
    return centers, covs, cweights


class HierarchicalGaussianMixture:
    """Top-down bisecting clusterer over jitted fits (see `hgm_fit`).

    Parity: cluster.py:343-572. The whole bisecting loop — every leaf's
    K=1/K=2 EM fits, BIC gates, split decisions, and relabeling — runs as
    ONE device program (a leaf is encoded as a zeroed weight mask so no
    shapes depend on leaf sizes); this class only holds configuration and
    the fitted model, and converts to NumPy lazily for the inspection
    attributes (`labels_`, `n_clusters_`).
    """

    def __init__(
        self,
        n_init: int = 1,
        max_iterations: int = 1000,
        min_points: Optional[int] = None,
        threshold_modifier: float = 1.0,
        covariance_type: str = "full",
        verbose: bool = False,
        normalize: bool = False,
        k_max: int = 16,
        seed: int = 42,
        split_all: bool = False,
        leaf_fit_points: Optional[int] = None,
    ):
        if threshold_modifier <= 0:
            raise ValueError("threshold_modifier must be positive.")
        self.n_init = n_init
        self.max_iterations = max_iterations
        self.min_points = min_points
        self.threshold_modifier = float(threshold_modifier)
        self.covariance_type = covariance_type
        self.verbose = verbose
        self.normalize = normalize
        self.k_max = k_max
        self.seed = seed
        self.split_all = split_all
        self.leaf_fit_points = leaf_fit_points
        self.model: Optional[ClusterModel] = None
        self._labels_dev: Optional[jnp.ndarray] = None
        self._n_leaves_dev = None

    # -- inspection attributes (lazy device->host pulls; the hot path
    #    never touches them) ------------------------------------------------
    @property
    def labels_(self) -> Optional[np.ndarray]:
        return None if self._labels_dev is None else np.asarray(self._labels_dev)

    @property
    def n_clusters_(self) -> int:
        return 0 if self._n_leaves_dev is None else int(self._n_leaves_dev)

    # -- internals ---------------------------------------------------------
    @staticmethod
    def _bic_tolerance(n_features: int, weights: np.ndarray) -> float:
        """n_params * log(N_eff) gate (cluster.py:407-418)."""
        w = weights / np.sum(weights)
        n_eff = 1.0 / np.sum(w * w)
        d = n_features
        n_params = d + d * (d + 1) / 2 + 1
        return float(n_params * np.log(n_eff))

    def fit(
        self,
        X,
        sample_weight=None,
        mask=None,
    ) -> "HierarchicalGaussianMixture":
        """Fit on (n, d) data; `mask` marks valid rows (fixed-shape path).

        Pure device dispatch: the whole bisecting loop runs inside one
        jitted program (`hgm_fit`) and nothing is pulled back to the host.
        """
        X = jnp.asarray(X)
        n, d = X.shape
        if sample_weight is None:
            sample_weight = jnp.ones((n,), dtype=X.dtype)
        else:
            sample_weight = jnp.asarray(sample_weight, dtype=X.dtype)
        if mask is None:
            mask = jnp.ones((n,), dtype=bool)
        else:
            mask = jnp.asarray(mask, dtype=bool)

        min_points = self.min_points if self.min_points is not None else 2 * d
        self.model, self._labels_dev, self._n_leaves_dev = hgm_fit(
            jax.random.PRNGKey(self.seed),
            X,
            sample_weight,
            mask,
            jnp.asarray(min_points, jnp.int32),
            jnp.asarray(self.threshold_modifier, X.dtype),
            self.k_max,
            self.covariance_type,
            min(self.max_iterations, self.k_max - 1),
            self.normalize,
            self.n_init,
            self.split_all,
            self.leaf_fit_points,
        )
        if self.verbose:
            print(f"HGM fit: {self.n_clusters_} leaves")
        return self

    def predict(self, X) -> np.ndarray:
        if self.model is None:
            raise ValueError("The model has not been fitted yet.")
        return np.asarray(cluster_predict(self.model, jnp.asarray(X)))

    def predict_proba(self, X) -> np.ndarray:
        if self.model is None:
            raise ValueError("The model has not been fitted yet.")
        proba = np.asarray(cluster_predict_proba(self.model, jnp.asarray(X)))
        return proba[:, : self.n_clusters_]
