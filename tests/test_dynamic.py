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


class TestDynamicConfig:
    """Config-level coverage mirroring the reference's
    VolumeVariationConfigTestCase (test_volume_variation.py:15-88)."""

    def _cfg(self, **kw):
        from tempest_tpu.config import SamplerConfig

        kw.setdefault("prior_transform", prior_transform)
        kw.setdefault("log_likelihood", log_likelihood)
        kw.setdefault("n_dim", N_DIM)
        kw.setdefault("n_particles", 64)
        return SamplerConfig(**kw)

    def test_none_selects_ess_mode_target(self):
        c = self._cfg(volume_variation=None, ess_ratio=3.0)
        assert c.get_target_metric() == 3.0 * 64

    def test_positive_selects_cv_target(self):
        c = self._cfg(volume_variation=0.7)
        assert c.get_target_metric() == 0.7

    def test_zero_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="volume_variation"):
            self._cfg(volume_variation=0.0)

    def test_negative_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="volume_variation"):
            self._cfg(volume_variation=-0.3)

    def test_coexists_with_ess_ratio(self):
        # ess_ratio still bounds the bracket search in dynamic mode
        c = self._cfg(volume_variation=0.5, ess_ratio=4.0)
        assert c.ess_ratio == 4.0
        assert c.get_target_metric() == 0.5


class TestDynamicEdgeCases:
    """Mirrors VolumeVariationEdgeCasesTestCase
    (test_volume_variation.py:208-296)."""

    def test_very_small_target_converges(self):
        # CV target 0.02: many tiny beta steps, must still reach beta=1.
        s = run_dynamic(0.02, n_particles=64, n_total=128)
        assert s.beta == 1.0
        assert int(s.state.hist.t) >= 5

    def test_large_target_converges(self):
        s = run_dynamic(5.0, n_particles=64, n_total=128)
        assert s.beta == 1.0

    def test_higher_dimensional(self):
        import jax.numpy as jnp

        d = 8
        s = Sampler(
            lambda u: -5.0 + 10.0 * u,
            lambda x: -0.5 * jnp.sum(x**2, axis=-1) - 0.5 * d * jnp.log(2 * jnp.pi),
            n_dim=d,
            n_particles=128,
            volume_variation=0.5,
            vectorize=True,
            clustering=False,
            random_state=2,
        )
        s.run(n_total=256, progress=False)
        assert s.beta == 1.0
        assert abs(s.evidence()[0] - (-d * np.log(10.0))) < 1.0

    def test_multimodal_dynamic(self):
        import jax.numpy as jnp

        def bimodal(x):
            a = -0.5 * jnp.sum((x - 2.0) ** 2, axis=-1)
            b = -0.5 * jnp.sum((x + 2.0) ** 2, axis=-1)
            return jnp.logaddexp(a, b) - jnp.log(2.0) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)

        s = Sampler(
            prior_transform,
            bimodal,
            n_dim=N_DIM,
            n_particles=128,
            volume_variation=0.5,
            vectorize=True,
            clustering=True,
            random_state=5,
        )
        s.run(n_total=256, progress=False)
        assert s.beta == 1.0
        x, w, _ = s.posterior()
        mass_pos = float(np.sum(w[x[:, 0] > 0]))
        assert 0.2 < mass_pos < 0.8

    def test_dynamic_vs_ess_same_answer(self):
        # Both modes target the same posterior; logZ must agree
        # (reference test_volume_variation.py:175-206).
        s_dyn = run_dynamic(0.5, seed=11, n_particles=128, n_total=512)
        s_ess = Sampler(
            prior_transform,
            log_likelihood,
            n_dim=N_DIM,
            n_particles=128,
            clustering=False,
            random_state=11,
        )
        s_ess.run(n_total=512, progress=False)
        assert abs(s_dyn.logz - s_ess.logz) < 0.6
        x1, w1, _ = s_dyn.posterior()
        x2, w2, _ = s_ess.posterior()
        m1 = np.average(x1, axis=0, weights=w1)
        m2 = np.average(x2, axis=0, weights=w2)
        np.testing.assert_allclose(m1, m2, atol=0.4)


class TestCVTargetSweep:
    """Sweep of CV targets + degenerate-geometry cases, mirroring the depth
    of reference test_volume_variation.py:140-296."""

    def test_iterations_decrease_monotonically_with_target(self):
        # Larger CV target -> bolder beta steps -> ladder no longer than
        # any smaller target's (reference test_different_volume_variation_
        # values).
        iters = []
        for cv in (0.2, 0.5, 1.0, 2.0):
            s = run_dynamic(cv)
            assert s.beta == 1.0
            iters.append(int(s.state.hist.t))
        assert all(a >= b for a, b in zip(iters, iters[1:])), iters

    def test_all_targets_reach_accurate_evidence(self):
        for cv in (0.2, 0.5, 1.0, 2.0):
            s = run_dynamic(cv)
            assert abs(s.logz - TRUE_LOGZ) < 1.0, (cv, s.logz)

    def test_degenerate_covariance_regularized(self):
        """Rank-deficient particle sets get the 1e-6*trace regularization
        and a FINITE CV (reference tools.py:101-105 adds the ridge rather
        than bailing; 1e10 is reserved for n < d+1 / failed inversion)."""
        from tempest_tpu.ops.tools import volume_variation_dtn

        # all particles on a line: covariance rank 1 < d
        u = jnp.stack([jnp.linspace(0, 1, 32), jnp.zeros(32)])[:, None, :]
        u = jnp.broadcast_to(u, (2, 1, 32))  # (d=2, T=1, N=32)
        w = jnp.ones((1, 32)) / 32.0
        cv = float(volume_variation_dtn(u, w))
        assert np.isfinite(cv) and 0.0 < cv < 1e10

    def test_too_few_samples_guard(self):
        from tempest_tpu.ops.tools import volume_variation_dtn

        u = jnp.ones((3, 1, 2))  # 2 samples < d + 1 = 4
        w = jnp.ones((1, 2)) / 2.0
        assert float(volume_variation_dtn(u, w)) == 1e10

    def test_dynamic_high_dim(self):
        # reference test_high_dimensional_with_volume_variation
        def ll(x):
            return -0.5 * jnp.sum(x**2) - 0.5 * 5 * jnp.log(2 * jnp.pi)

        s = Sampler(
            prior_transform, ll, n_dim=5, n_particles=64,
            volume_variation=1.0, clustering=False, random_state=2,
        )
        s.run(n_total=256, progress=False)
        assert s.beta == 1.0
        assert abs(s.logz - (-5 * np.log(10.0))) < 1.5

    def test_dynamic_multimodal_clustered(self):
        # reference test_multimodal_with_volume_variation
        def ll(x):
            a = -0.5 * jnp.sum((x - 2.0) ** 2) / 0.25
            b = -0.5 * jnp.sum((x + 2.0) ** 2) / 0.25
            return jnp.logaddexp(a, b) - jnp.log(2.0) - N_DIM / 2 * jnp.log(
                2 * jnp.pi * 0.25
            )

        s = Sampler(
            prior_transform, ll, n_dim=N_DIM, n_particles=128,
            volume_variation=1.0, clustering=True, random_state=3,
        )
        s.run(n_total=512, progress=False)
        assert s.beta == 1.0
        x, w, _ = s.posterior()
        # both modes present
        frac_pos = float(np.sum(w[x[:, 0] > 0]))
        assert 0.15 < frac_pos < 0.85
