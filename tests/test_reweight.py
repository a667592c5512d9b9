"""Reweighting-step tests — ports of the Reweighter behaviors from reference
tests/test_steps.py: beta monotonicity, bisection hitting the target ESS,
stay-at-beta when ESS == target, jump-to-one."""

import jax.numpy as jnp
import numpy as np

from tempest_tpu.state import commit, make_current, make_history
from tempest_tpu.steps.reweight import reweight


def _history_with(logl_iters, betas, logzs, capacity=8, n_dim=2, seed=0):
    N = len(logl_iters[0])
    hist = make_history(capacity, N, n_dim)
    cur = make_current(N, n_dim)
    rng = np.random.default_rng(seed)
    for t, logl in enumerate(logl_iters):
        cur = cur.replace(
            u=jnp.asarray(rng.uniform(size=(N, n_dim)), jnp.float32),
            x=jnp.asarray(rng.uniform(size=(N, n_dim)), jnp.float32),
            logl=jnp.asarray(logl, jnp.float32),
            beta=jnp.asarray(betas[t], jnp.float32),
            logz=jnp.asarray(logzs[t], jnp.float32),
        )
        hist = commit(hist, cur)
    return hist


class TestReweightESS:
    def test_beta_advances_and_hits_target_ess(self):
        rng = np.random.default_rng(0)
        N = 256
        logl = rng.normal(-50, 10, size=N)
        hist = _history_with([logl], [0.0], [0.0])
        target = 2.0 * 64  # ess_ratio * n_particles, well below N
        rw = reweight(hist, jnp.asarray(0.0, jnp.float32), float(target))
        beta = float(rw.beta)
        assert beta > 0.0
        # bisection converged: ESS within tolerance of target (or bracket tol)
        assert abs(float(rw.ess) - target) < max(0.01 * target, 0.5) + 2.0

    def test_beta_monotone_across_iterations(self):
        rng = np.random.default_rng(1)
        N = 128
        logl = rng.normal(-20, 5, size=N)
        hist = _history_with([logl], [0.0], [0.0])
        rw1 = reweight(hist, jnp.asarray(0.0, jnp.float32), 64.0)
        b1 = float(rw1.beta)
        # commit that iteration and reweight again from b1
        cur = make_current(N, 2).replace(
            u=jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32),
            x=jnp.asarray(rng.uniform(size=(N, 2)), jnp.float32),
            logl=jnp.asarray(rng.normal(-15, 4, size=N), jnp.float32),
            beta=rw1.beta,
            logz=rw1.logz,
        )
        hist2 = commit(hist, cur)
        rw2 = reweight(hist2, rw1.beta, 64.0)
        assert float(rw2.beta) >= b1

    def test_jump_to_one_when_ess_high(self):
        # Nearly-identical logl -> weights stay uniform -> ESS ~ N at beta=1
        logl = np.full(128, -10.0) + np.random.default_rng(2).normal(0, 1e-3, 128)
        hist = _history_with([logl], [0.0], [0.0])
        rw = reweight(hist, jnp.asarray(0.0, jnp.float32), 64.0)
        assert float(rw.beta) == 1.0

    def test_stay_when_cannot_advance(self):
        # ESS already below target at beta_prev -> stay
        rng = np.random.default_rng(3)
        logl = rng.normal(-100, 30, size=64)
        hist = _history_with([logl], [0.5], [-5.0])
        target = 5000.0  # impossible target
        rw = reweight(hist, jnp.asarray(0.5, jnp.float32), target)
        assert float(rw.beta) == 0.5

    def test_weights_normalized_and_masked(self):
        rng = np.random.default_rng(4)
        logl = rng.normal(-30, 5, size=64)
        hist = _history_with([logl], [0.0], [0.0], capacity=4)
        rw = reweight(hist, jnp.asarray(0.0, jnp.float32), 32.0)
        w = np.array(rw.weights)
        mask = np.array(hist.sample_mask())
        assert np.isclose(w.sum(), 1.0, rtol=1e-4)
        assert np.all(w[~mask] == 0.0)

    def test_logz_matches_direct_formula(self):
        rng = np.random.default_rng(5)
        logl = rng.normal(-10, 2, size=128)
        hist = _history_with([logl], [0.0], [0.0])
        rw = reweight(hist, jnp.asarray(0.0, jnp.float32), 64.0)
        beta = float(rw.beta)
        # single warmup iteration: logz(beta) = log mean exp(beta*logl)
        expected = np.log(np.mean(np.exp(beta * logl - np.max(beta * logl)))) + np.max(
            beta * logl
        )
        assert np.isclose(float(rw.logz), expected, atol=1e-3)


class TestReweightDynamic:
    def test_dynamic_mode_returns_valid_beta(self):
        rng = np.random.default_rng(6)
        N = 128
        logl = rng.normal(-50, 10, size=N)
        hist = _history_with([logl], [0.0], [0.0], n_dim=3)
        rw = reweight(
            hist, jnp.asarray(0.0, jnp.float32), 64.0, cv_target=0.05, dynamic=True
        )
        beta = float(rw.beta)
        assert 0.0 <= beta <= 1.0
        assert np.isfinite(float(rw.cv))

    def test_dynamic_beta_below_ess_beta(self):
        # CV constraint should never advance beta beyond the ESS-mode choice
        rng = np.random.default_rng(7)
        N = 128
        logl = rng.normal(-50, 10, size=N)
        hist = _history_with([logl], [0.0], [0.0], n_dim=3, seed=7)
        rw_ess = reweight(hist, jnp.asarray(0.0, jnp.float32), 64.0)
        rw_dyn = reweight(
            hist, jnp.asarray(0.0, jnp.float32), 64.0, cv_target=1e-4, dynamic=True
        )
        assert float(rw_dyn.beta) <= float(rw_ess.beta) + 1e-5

    def test_nan_history_terminates(self):
        # Adversarial NaN-poisoned logl: every ESS/metric probe evaluates to
        # NaN. The bracket search and both bisections must still terminate
        # (MAX_BISECTION_ITERATIONS hard cap, reference reweight.py:121) and
        # return without hanging the while_loops.
        rng = np.random.default_rng(8)
        N = 64
        logl = rng.normal(-30.0, 5.0, size=N)
        logl[::3] = np.nan
        hist = _history_with([logl], [0.0], [0.0], n_dim=3, seed=8)
        for dynamic in (False, True):
            rw = reweight(
                hist,
                jnp.asarray(0.0, jnp.float32),
                32.0,
                cv_target=0.05,
                dynamic=dynamic,
                use_pallas=False,
            )
            beta = float(rw.beta)
            # Terminated with an in-range (or NaN, but not hung) result.
            assert np.isnan(beta) or 0.0 <= beta <= 1.0

    def test_all_nan_history_terminates(self):
        # Fully-NaN logl drives even the interval arithmetic to NaN.
        logl = np.full(32, np.nan)
        hist = _history_with([logl], [0.0], [0.0], n_dim=2, seed=9)
        rw = reweight(
            hist,
            jnp.asarray(0.0, jnp.float32),
            16.0,
            cv_target=0.05,
            dynamic=True,
            use_pallas=False,
        )
        assert rw.beta.shape == ()
