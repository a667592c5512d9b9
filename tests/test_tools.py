"""Unit tests for core numerics — ports of reference tests/test_tools.py
semantics (ESS values, resampling distributions, logZ increments, trimming)
plus mask-aware cases unique to the fixed-shape TPU design."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempest_tpu.ops.tools import (
    compute_ess,
    effective_sample_size,
    ess_from_logw,
    increment_logz,
    logsumexp,
    multinomial_resample,
    systematic_resample,
    trim_weights_mask,
    volume_variation,
)


class TestESS:
    def test_uniform_weights(self):
        w = jnp.ones(100)
        assert np.isclose(float(effective_sample_size(w)), 100.0, rtol=1e-5)

    def test_degenerate_weights(self):
        w = jnp.zeros(50).at[7].set(1.0)
        assert np.isclose(float(effective_sample_size(w)), 1.0, rtol=1e-5)

    def test_skewed_weights(self):
        w = jnp.array([0.5, 0.25, 0.125, 0.125])
        expected = 1.0 / np.sum((np.array([0.5, 0.25, 0.125, 0.125])) ** 2)
        assert np.isclose(float(effective_sample_size(w)), expected, rtol=1e-5)

    def test_unnormalized_invariance(self):
        w = jnp.array([1.0, 2.0, 3.0])
        assert np.isclose(
            float(effective_sample_size(w)), float(effective_sample_size(w * 17.0)), rtol=1e-5
        )

    def test_masked(self):
        w = jnp.array([1.0, 1.0, 99.0, 99.0])
        mask = jnp.array([True, True, False, False])
        assert np.isclose(float(effective_sample_size(w, mask)), 2.0, rtol=1e-5)

    def test_ess_from_logw_matches(self):
        logw = jnp.array([-1.0, -2.0, -0.5, -3.0])
        w = jnp.exp(logw)
        assert np.isclose(
            float(ess_from_logw(logw)), float(effective_sample_size(w)), rtol=1e-4
        )

    def test_ess_from_logw_with_neg_inf(self):
        logw = jnp.array([0.0, 0.0, -jnp.inf, -jnp.inf])
        assert np.isclose(float(ess_from_logw(logw)), 2.0, rtol=1e-5)

    def test_compute_ess_fraction(self):
        logw = jnp.zeros(64)
        assert np.isclose(float(compute_ess(logw)), 1.0, rtol=1e-5)


class TestLogsumexp:
    def test_matches_numpy(self):
        x = jnp.array([-1.0, 2.0, 0.5])
        expected = np.log(np.sum(np.exp(np.array(x))))
        assert np.isclose(float(logsumexp(x)), expected, rtol=1e-6)

    def test_all_neg_inf(self):
        x = jnp.full((4,), -jnp.inf)
        assert float(logsumexp(x)) == -np.inf

    def test_axis_with_neg_inf_rows(self):
        x = jnp.array([[-jnp.inf, -jnp.inf], [0.0, 0.0]])
        out = np.array(logsumexp(x, axis=1))
        assert out[0] == -np.inf
        assert np.isclose(out[1], np.log(2.0), rtol=1e-6)

    def test_increment_logz(self):
        logw = jnp.array([-1.0, -2.0, -3.0])
        expected = np.log(np.sum(np.exp(np.array(logw))))
        assert np.isclose(float(increment_logz(logw)), expected, rtol=1e-6)


class TestResampling:
    def test_systematic_counts_match_weights(self):
        # With equal weights every index appears exactly once.
        key = jax.random.PRNGKey(0)
        w = jnp.ones(16) / 16.0
        idx = np.array(systematic_resample(key, 16, w))
        assert sorted(idx.tolist()) == list(range(16))

    def test_systematic_proportionality(self):
        key = jax.random.PRNGKey(1)
        w = jnp.array([0.6, 0.2, 0.15, 0.05])
        idx = np.array(systematic_resample(key, 1000, w))
        counts = np.bincount(idx, minlength=4) / 1000.0
        # Systematic resampling has bounded deviation: |count - w| < 1/size
        assert np.all(np.abs(counts - np.array(w)) < 1.0 / 1000 + 1e-9)

    def test_systematic_zero_weight_never_selected(self):
        key = jax.random.PRNGKey(2)
        w = jnp.array([0.5, 0.0, 0.5, 0.0])
        idx = np.array(systematic_resample(key, 100, w))
        assert set(idx.tolist()) <= {0, 2}

    def test_multinomial_distribution(self):
        key = jax.random.PRNGKey(3)
        w = jnp.array([0.7, 0.2, 0.1])
        idx = np.array(multinomial_resample(key, 20000, w))
        counts = np.bincount(idx, minlength=3) / 20000.0
        assert np.allclose(counts, np.array(w), atol=0.02)

    def test_multinomial_zero_weight_never_selected(self):
        key = jax.random.PRNGKey(4)
        w = jnp.array([0.0, 1.0, 0.0])
        idx = np.array(multinomial_resample(key, 50, w))
        assert set(idx.tolist()) == {1}


class TestTrimWeights:
    def test_preserves_ess_fraction(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.dirichlet(np.ones(500) * 0.1))
        keep, w_trim = trim_weights_mask(w, ess=0.99, bins=1000)
        ess_total = float(effective_sample_size(w))
        ess_trim = float(effective_sample_size(w_trim, keep))
        assert ess_trim / ess_total >= 0.99 - 1e-3

    def test_trims_something_for_skewed(self):
        rng = np.random.default_rng(1)
        w = np.full(1000, 1e-12)
        w[:10] = 0.1
        w = jnp.asarray(w / w.sum())
        keep, w_trim = trim_weights_mask(w, ess=0.99, bins=1000)
        assert int(np.sum(np.array(keep))) < 1000
        assert np.isclose(float(jnp.sum(w_trim)), 1.0, rtol=1e-5)

    def test_uniform_keeps_all(self):
        w = jnp.ones(100) / 100.0
        keep, w_trim = trim_weights_mask(w, ess=0.99, bins=1000)
        assert int(np.sum(np.array(keep))) == 100

    def test_mask_excluded(self):
        w = jnp.ones(10)
        mask = jnp.arange(10) < 5
        keep, w_trim = trim_weights_mask(w, mask=mask, ess=0.99, bins=100)
        keep = np.array(keep)
        assert not keep[5:].any()
        assert keep[:5].all()


class TestVolumeVariation:
    def test_perfect_gaussian_small_cv(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((5000, 3)))
        cv = float(volume_variation(x))
        assert 0.0 <= cv < 0.1

    def test_too_few_samples_returns_large(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 5)))
        assert float(volume_variation(x)) == pytest.approx(1e10)

    def test_weighted_matches_unweighted_for_uniform(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((500, 2)))
        w = jnp.ones(500)
        assert np.isclose(
            float(volume_variation(x)), float(volume_variation(x, w)), rtol=1e-4
        )

    def test_masked(self):
        rng = np.random.default_rng(3)
        x_good = rng.standard_normal((400, 2))
        x_junk = np.full((100, 2), 1e6)
        x = jnp.asarray(np.concatenate([x_good, x_junk]))
        mask = jnp.arange(500) < 400
        cv_masked = float(volume_variation(x, mask=mask))
        cv_ref = float(volume_variation(jnp.asarray(x_good)))
        assert np.isclose(cv_masked, cv_ref, rtol=1e-3)

    def test_degenerate_data(self):
        x = jnp.zeros((100, 4))
        cv = float(volume_variation(x))
        assert np.isfinite(cv)
