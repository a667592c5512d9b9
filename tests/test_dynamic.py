"""Dynamic (volume-variation / CV-targeted) mode.

Mirrors the reference's tests/test_volume_variation.py: full runs at
several CV targets, ladder-length behavior vs the target, CV history
recording, and accuracy of evidence in dynamic mode.
"""

import numpy as np
import jax.numpy as jnp

from tempest_tpu import Sampler

N_DIM = 2
TRUE_LOGZ = -N_DIM * np.log(10.0)


def prior_transform(u):
    return -5.0 + 10.0 * u


def log_likelihood(x):
    return -0.5 * jnp.sum(x**2) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)


def run_dynamic(cv, seed=0, n_particles=64, n_total=256):
    s = Sampler(
        prior_transform,
        log_likelihood,
        n_dim=N_DIM,
        n_particles=n_particles,
        volume_variation=cv,
        clustering=False,
        random_state=seed,
    )
    s.run(n_total=n_total, progress=False)
    return s


class TestDynamicMode:
    def test_reaches_posterior_small_target(self):
        s = run_dynamic(0.2)
        assert s.beta == 1.0
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 1.0

    def test_reaches_posterior_large_target(self):
        s = run_dynamic(1.0)
        assert s.beta == 1.0
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 1.0

    def test_larger_cv_target_fewer_iterations(self):
        """A looser CV target lets beta advance faster (reference
        reweight.py:427-495: CV grows with the beta increment)."""
        slow = run_dynamic(0.2)
        fast = run_dynamic(1.5)
        assert int(fast.state.hist.t) <= int(slow.state.hist.t)

    def test_cv_history_recorded(self):
        s = run_dynamic(0.5)
        res = s.results()
        cv = res["cv"]
        # warm-up iteration has cv=0; afterwards finite nonnegative values
        assert np.all(np.isfinite(cv))
        assert np.all(cv >= 0.0)

    def test_beta_ladder_monotone(self):
        s = run_dynamic(0.5)
        beta = s.results()["beta"]
        assert np.all(np.diff(beta) >= -1e-7)

    def test_posterior_moments_dynamic(self):
        s = run_dynamic(0.5, seed=3)
        x, w, _ = s.posterior()
        mean = np.average(x, axis=0, weights=w)
        var = np.average((x - mean) ** 2, axis=0, weights=w)
        np.testing.assert_allclose(mean, 0.0, atol=0.3)
        np.testing.assert_allclose(var, 1.0, atol=0.5)

    def test_dynamic_with_clustering(self):
        s = Sampler(
            prior_transform,
            log_likelihood,
            n_dim=N_DIM,
            n_particles=64,
            volume_variation=0.5,
            clustering=True,
            random_state=1,
        )
        s.run(n_total=256, progress=False)
        assert s.beta == 1.0
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 1.0

    def test_cv_property_exposed(self):
        s = run_dynamic(0.5)
        assert isinstance(s.cv, float)
        assert s.volume_variation == 0.5
