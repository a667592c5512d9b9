"""Reweighting step: adaptive temperature-ladder selection.

TPU redesign of /root/reference/tempest/steps/reweight.py:11-495. The
reference drives dozens of Python-level bisection probes per iteration, each
rebuilding the full (N_hist x T) MIS weight matrix in NumPy; here the
bracket search and the metric bisection are `lax.while_loop`s inside ONE
jitted program, so the entire ladder selection runs on-device with zero
host round-trips. Convergence rules, tolerances and edge-case semantics
(stay-at-beta when ESS == target, jump-to-1 when ESS >= target throughout,
dynamic/CV mode boundary logic) are preserved exactly — citations inline.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import (
    BETA_RTOL,
    BETA_TOLERANCE,
    ESS_TOLERANCE,
    MAX_BISECTION_ITERATIONS,
    METRIC_ATOL,
    METRIC_ATOL_CV,
)
from ..ops.tools import ess_from_logw, volume_variation_dtn
from ..state import History, logw_from_denominator, mis_denominator


class ReweightResult(NamedTuple):
    beta: jnp.ndarray  # () new inverse temperature
    weights: jnp.ndarray  # (T_max, N) normalized importance weights (masked)
    ess: jnp.ndarray  # () effective sample size at beta
    cv: jnp.ndarray  # () volume variation at beta
    logz: jnp.ndarray  # () evidence estimate at beta


def _beta_interval_tol(lo, hi):
    """Bracket-scaled interval tolerance (reweight.py:188-199, 279-287)."""
    scale = jnp.maximum(jnp.maximum(jnp.abs(lo), jnp.abs(hi)), jnp.finfo(lo.dtype).tiny)
    return jnp.maximum(BETA_RTOL * scale, BETA_TOLERANCE * scale)


def _make_metric_fns(hist: History, dynamic: bool, denom: jnp.ndarray):
    """ess_at(beta) and metric_at(beta) evaluators over the masked history.

    The O(N_hist x T) MIS denominator `denom` is beta-independent, so it is
    computed ONCE per reweight; every bisection probe is then a cheap
    O(N_hist) evaluation (the reference rebuilds the full matrix per probe,
    reweight.py:88-118)."""
    s_mask = hist.sample_mask()

    def ess_at(beta):
        logw, _ = logw_from_denominator(hist, denom, beta)
        return ess_from_logw(logw)

    def metric_at(beta):
        logw, _ = logw_from_denominator(hist, denom, beta)
        ess = ess_from_logw(logw)
        if dynamic:
            w = jnp.exp(logw)
            metric = volume_variation_dtn(hist.u, w, mask=s_mask)
        else:
            metric = ess
        return metric, ess

    return ess_at, metric_at


def _find_ess_bracket(ess_at, beta_current, ess_target, dtype):
    """Bracket [beta_low, beta_high] where ESS crosses the target.

    Parity: reweight.py:225-297 including the <=-semantics (stay when ESS
    already at/below target) and the jump-to-1.0 case.
    """
    one = jnp.asarray(1.0, dtype)
    ess_cur = ess_at(beta_current)
    ess_one = ess_at(one)

    def bisect(_):
        # Hard cap at MAX_BISECTION_ITERATIONS like every other bisection
        # (reference reweight.py:121 applies the 200-cap to the bracket
        # search too): the interval tolerance alone would never terminate
        # if the tolerance arithmetic returned NaN (NaN > NaN is False so
        # the plain cond WOULD exit — but a NaN ESS flipping lo/hi
        # selection could otherwise stall progress at a frozen interval).
        def cond(c):
            lo, hi, i = c
            return ((hi - lo) > _beta_interval_tol(lo, hi)) & (
                i < MAX_BISECTION_ITERATIONS
            )

        def body(c):
            lo, hi, i = c
            mid = 0.5 * (lo + hi)
            ess_mid = ess_at(mid)
            lo = jnp.where(ess_mid >= ess_target, mid, lo)
            hi = jnp.where(ess_mid >= ess_target, hi, mid)
            return lo, hi, i + 1

        lo, hi, _ = jax.lax.while_loop(
            cond, body, (beta_current, one, jnp.asarray(0, jnp.int32))
        )
        return lo, hi

    lo, hi = jax.lax.cond(
        (ess_cur <= ess_target) | (ess_one >= ess_target),
        lambda _: (beta_current, beta_current),
        bisect,
        operand=None,
    )
    # If ESS >= target all the way to 1.0: both endpoints are 1.0
    jump = (ess_cur > ess_target) & (ess_one >= ess_target)
    lo = jnp.where(jump, one, lo)
    hi = jnp.where(jump, one, hi)
    return lo, hi


def _find_beta_bisection(metric_at, beta_min, beta_max, target, dynamic: bool):
    """Metric-targeted bisection with dual (relative+absolute) tolerance.

    Parity: reweight.py:120-223 — convergence when
    |metric - target| < max(ESS_TOLERANCE*|target|, metric_atol) or the
    bracket shrinks below the scaled beta tolerance or beta hits 1.0;
    non-finite metrics count as 1e10; hard cap of 200 iterations.
    """
    metric_atol = METRIC_ATOL_CV if dynamic else METRIC_ATOL
    dtype = beta_min.dtype

    def cond(c):
        return (~c["done"]) & (c["i"] < MAX_BISECTION_ITERATIONS)

    def body(c):
        lo, hi = c["lo"], c["hi"]
        beta = 0.5 * (lo + hi)
        metric, _ = metric_at(beta)
        metric = jnp.where(jnp.isfinite(metric), metric, jnp.asarray(1e10, dtype))

        metric_conv = jnp.abs(metric - target) < jnp.maximum(
            ESS_TOLERANCE * jnp.abs(target), metric_atol
        )
        beta_conv = (hi - lo) < _beta_interval_tol(lo, hi)
        done = metric_conv | beta_conv | (beta == 1.0)

        if dynamic:
            # CV increases with beta (reweight.py:212-220)
            go_up = metric < target
        else:
            # ESS decreases with beta (reweight.py:204-211)
            go_up = metric >= target
        lo = jnp.where((~done) & go_up, beta, lo)
        hi = jnp.where((~done) & (~go_up), beta, hi)
        return {"lo": lo, "hi": hi, "beta": beta, "i": c["i"] + 1, "done": done}

    init = {
        "lo": beta_min,
        "hi": beta_max,
        "beta": 0.5 * (beta_min + beta_max),
        "i": jnp.asarray(0, jnp.int32),
        "done": jnp.asarray(False),
    }
    out = jax.lax.while_loop(cond, body, init)
    return out["beta"]


@partial(jax.jit, static_argnames=("dynamic", "use_pallas"))
def reweight(
    hist: History,
    beta_prev: jnp.ndarray,
    ess_target: float,
    cv_target: float = 0.0,
    dynamic: bool = False,
    use_pallas: bool = True,
) -> ReweightResult:
    """Select the next inverse temperature and compute MIS weights.

    ESS mode (dynamic=False): reweight.py:393-426.
    Dynamic/CV mode (dynamic=True): reweight.py:427-495 — the ESS bracket
    bounds the search, then beta targets the volume-variation CV.
    """
    dtype = hist.logl.dtype
    beta_prev = jnp.asarray(beta_prev, dtype)
    ess_target = jnp.asarray(ess_target, dtype)

    # optimization_barrier pins the (expensive, beta-independent) denominator
    # as a materialized value: without it XLA may rematerialize the whole
    # (S x T) computation inside each bisection-probe loop body.
    denom = jax.lax.optimization_barrier(mis_denominator(hist))
    ess_at, metric_at = _make_metric_fns(hist, dynamic, denom)
    _, ess_metric_at = _make_metric_fns(hist, False, denom)

    if not dynamic:
        # ESS decreases monotonically in beta, so the bracket search the
        # reference runs before bisecting (reweight.py:225-297) adds no
        # information in ESS mode — bisect directly on [beta_prev, 1] with
        # the same convergence rules and endpoint semantics (stay when the
        # ESS is already at/below target, jump when ESS(1) >= target).
        from ..ops.pallas_reweight import ess_bisect_beta, pallas_supported

        if use_pallas and pallas_supported(hist.logl.size, hist.logl.dtype):
            # Entire bisection in one VMEM-resident TPU kernel: logl and
            # the masked denominator load once; every probe is on-chip.
            # (Single-chip only: callers pass use_pallas=False when the
            # history is mesh-sharded — the flatten below would force an
            # all-gather.)
            bm = jnp.where(hist.sample_mask(), denom, jnp.inf)
            beta = ess_bisect_beta(
                hist.logl.reshape(-1), bm.reshape(-1), beta_prev, ess_target
            ).astype(dtype)
        else:
            one = jnp.asarray(1.0, dtype)
            ess_cur = ess_at(beta_prev)
            ess_one = ess_at(one)
            beta_bisect = _find_beta_bisection(
                ess_metric_at, beta_prev, one, ess_target, dynamic=False
            )
            beta = jnp.where(
                ess_cur <= ess_target,
                beta_prev,
                jnp.where(ess_one >= ess_target, one, beta_bisect),
            )
    else:
        beta_low, beta_high = _find_ess_bracket(ess_at, beta_prev, ess_target, dtype)
        no_crossing = beta_low == beta_high
        cv_target_arr = jnp.asarray(cv_target, dtype)
        cv_prev, _ = metric_at(beta_prev)
        cv_high, _ = metric_at(beta_high)
        beta_cv = _find_beta_bisection(
            metric_at, beta_prev, beta_high, cv_target_arr, dynamic=True
        )
        # Boundary logic (reweight.py:449-479): target above CV(beta_high)
        # -> take beta_high; target below CV(beta_prev) -> stay; else bisect.
        beta_sel = jnp.where(
            cv_target_arr >= cv_high,
            beta_high,
            jnp.where(cv_target_arr <= cv_prev, beta_prev, beta_cv),
        )
        beta = jnp.where(no_crossing, beta_low, beta_sel)

    # Final state at the selected beta
    logw, logz = logw_from_denominator(hist, denom, beta)
    weights = jnp.exp(logw)  # normalized; masked entries are exp(-inf) = 0
    ess = ess_from_logw(logw)
    cv = volume_variation_dtn(hist.u, weights, mask=hist.sample_mask())
    return ReweightResult(beta=beta, weights=weights, ess=ess, cv=cv, logz=logz)
