"""Pallas ESS-bisection kernel vs the XLA reference path.

Runs the kernel in interpreter mode (CPU backend) and checks it selects
the same temperature as the jnp bisection on a range of histories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempest_tpu.ops.pallas_reweight import ess_bisect_beta
from tempest_tpu.ops.tools import ess_from_logw
from tempest_tpu.state import (
    commit,
    logw_from_denominator,
    make_current,
    make_history,
    mis_denominator,
)
from tempest_tpu.steps.reweight import reweight


def build_history(n_iters, N=64, D=2, seed=0, spread=2.0):
    rng = np.random.default_rng(seed)
    hist = make_history(8, N, D)
    cur = make_current(N, D)
    for t in range(n_iters):
        u = jnp.asarray(rng.uniform(0, 1, (N, D)), jnp.float32)
        logl = jnp.asarray(rng.normal(-10.0, spread, N), jnp.float32)
        cur = cur.replace(
            u=u, x=u, logl=logl,
            beta=jnp.asarray(0.2 * t, jnp.float32),
            logz=jnp.asarray(-0.5 * t, jnp.float32),
        )
        hist = commit(hist, cur)
    return hist


@pytest.mark.parametrize("seed,spread,beta_prev", [
    (0, 2.0, 0.1), (1, 8.0, 0.3), (2, 0.5, 0.0), (3, 4.0, 0.9),
])
def test_kernel_matches_jnp_bisection(seed, spread, beta_prev):
    hist = build_history(4, seed=seed, spread=spread)
    target = 128.0
    denom = mis_denominator(hist)
    bm = jnp.where(hist.sample_mask(), denom, jnp.inf)
    beta_k = float(
        ess_bisect_beta(hist.flat_logl(), bm.reshape(-1), beta_prev, target, interpret=True)
    )
    rw = reweight(hist, jnp.asarray(beta_prev, jnp.float32), target)
    beta_j = float(rw.beta)
    # Same convergence rules; tiny float drift from different sum orders
    assert abs(beta_k - beta_j) < 2e-3, (beta_k, beta_j)
    # And the selected beta actually achieves the target ESS (or endpoints)
    if beta_prev < beta_k < 1.0:
        logw, _ = logw_from_denominator(hist, denom, beta_k)
        ess = float(ess_from_logw(logw))
        assert abs(ess - target) < max(0.01 * target, 1.0)


def test_kernel_endpoint_stay():
    """ESS already at/below target -> stay at beta_prev."""
    hist = build_history(4, seed=5, spread=12.0)
    denom = mis_denominator(hist)
    bm = jnp.where(hist.sample_mask(), denom, jnp.inf)
    beta = float(ess_bisect_beta(hist.flat_logl(), bm.reshape(-1), 0.5, 1e9, interpret=True))
    assert beta == 0.5


def test_kernel_endpoint_jump():
    """ESS(1) still above target -> jump to 1."""
    hist = build_history(4, seed=6, spread=0.01)  # near-equal weights
    denom = mis_denominator(hist)
    bm = jnp.where(hist.sample_mask(), denom, jnp.inf)
    beta = float(ess_bisect_beta(hist.flat_logl(), bm.reshape(-1), 0.1, 4.0, interpret=True))
    assert beta == 1.0


def test_padding_to_lanes():
    """S not a multiple of 128 pads with zero-weight entries."""
    hist = build_history(3, N=10, D=2, seed=7)  # S = 80, not lane-aligned
    denom = mis_denominator(hist)
    bm = jnp.where(hist.sample_mask(), denom, jnp.inf)
    beta = float(ess_bisect_beta(hist.flat_logl(), bm.reshape(-1), 0.0, 15.0, interpret=True))
    rw = reweight(hist, jnp.asarray(0.0, jnp.float32), 15.0)
    assert abs(beta - float(rw.beta)) < 2e-3
