"""Clustering tests — ports of reference tests/test_cluster.py semantics:
weighted GMM fits, covariance types, BIC, hierarchical splitting, min_points,
normalization, predict/predict_proba."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempest_tpu.cluster import (
    GaussianMixture,
    HierarchicalGaussianMixture,
    cluster_predict,
    cluster_predict_proba,
    gmm_bic,
    gmm_fit,
    gmm_predict,
)


def two_blobs(n=200, sep=4.0, seed=0, d=2):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, d)) * 0.3
    b = rng.standard_normal((n, d)) * 0.3 + sep
    return np.concatenate([a, b])


class TestGMM:
    def test_single_component_fit(self):
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.standard_normal((500, 2)) + 3.0)
        p = gmm_fit(jax.random.PRNGKey(0), X, jnp.ones(500), 1)
        np.testing.assert_allclose(np.array(p.means[0]), [3.0, 3.0], atol=0.2)
        np.testing.assert_allclose(np.array(p.covariances[0]), np.eye(2), atol=0.3)

    def test_two_component_fit(self):
        X = jnp.asarray(two_blobs())
        p = gmm_fit(jax.random.PRNGKey(1), X, jnp.ones(400), 2)
        means = np.sort(np.array(p.means)[:, 0])
        np.testing.assert_allclose(means, [0.0, 4.0], atol=0.3)
        np.testing.assert_allclose(np.array(p.weights), [0.5, 0.5], atol=0.1)

    @pytest.mark.parametrize("ctype", ["full", "tied", "diag", "spherical"])
    def test_covariance_types(self, ctype):
        rng = np.random.default_rng(2)
        X = jnp.asarray(rng.standard_normal((300, 2)))
        p = gmm_fit(jax.random.PRNGKey(2), X, jnp.ones(300), 1, covariance_type=ctype)
        cov = np.array(p.covariances[0])
        assert cov.shape == (2, 2)
        assert np.all(np.isfinite(cov))
        np.testing.assert_allclose(np.diag(cov), [1.0, 1.0], atol=0.35)

    def test_sample_weights_shift_fit(self):
        X = jnp.asarray(two_blobs(seed=3))
        w = jnp.concatenate([jnp.ones(200), jnp.zeros(200)])
        p = gmm_fit(jax.random.PRNGKey(3), X, w, 1)
        np.testing.assert_allclose(np.array(p.means[0]), [0.0, 0.0], atol=0.2)

    def test_predict(self):
        X = jnp.asarray(two_blobs(seed=4))
        p = gmm_fit(jax.random.PRNGKey(4), X, jnp.ones(400), 2)
        labels = np.array(gmm_predict(p, X))
        # the two halves should be (almost entirely) in different clusters
        assert abs(labels[:200].mean() - labels[200:].mean()) > 0.9

    def test_bic_prefers_two_for_bimodal(self):
        X = jnp.asarray(two_blobs(seed=5, sep=6.0))
        w = jnp.ones(400)
        p1 = gmm_fit(jax.random.PRNGKey(5), X, w, 1)
        p2 = gmm_fit(jax.random.PRNGKey(5), X, w, 2)
        assert float(gmm_bic(p2, X)) < float(gmm_bic(p1, X))

    def test_bic_prefers_one_for_unimodal(self):
        rng = np.random.default_rng(6)
        X = jnp.asarray(rng.standard_normal((400, 2)))
        w = jnp.ones(400)
        p1 = gmm_fit(jax.random.PRNGKey(6), X, w, 1)
        p2 = gmm_fit(jax.random.PRNGKey(6), X, w, 2)
        # BIC penalty should keep K=1 competitive (within penalty magnitude)
        assert float(gmm_bic(p1, X)) <= float(gmm_bic(p2, X)) + 50.0


class TestGaussianMixtureFacade:
    """Public class facade (reference cluster.py:5-340 API surface)."""

    def test_fit_returns_self_and_sets_attributes(self):
        gm = GaussianMixture(n_components=2, random_state=0)
        out = gm.fit(two_blobs(seed=10))
        assert out is gm
        assert gm.weights_.shape == (2,)
        assert gm.means_.shape == (2, 2)
        assert gm.covariances_.shape == (2, 2, 2)
        assert gm.converged_
        assert gm.n_iter_ >= 1
        assert np.isfinite(gm.lower_bound_)
        means = np.sort(gm.means_[:, 0])
        np.testing.assert_allclose(means, [0.0, 4.0], atol=0.3)

    def test_predict_separates_blobs(self):
        X = two_blobs(seed=11)
        gm = GaussianMixture(n_components=2, random_state=1).fit(X)
        labels = gm.predict(X)
        assert labels.shape == (400,)
        # each blob gets a homogeneous label
        assert len(set(labels[:200])) == 1
        assert len(set(labels[200:])) == 1
        assert labels[0] != labels[-1]

    def test_bic_prefers_two_components_for_bimodal(self):
        # n_init restarts guard against a collapsed single-seed K=2 init
        # (and exercise the vmapped best-of-n path through the facade).
        X = two_blobs(seed=12)
        bic1 = GaussianMixture(n_components=1, random_state=2, n_init=4).fit(X).bic(X)
        bic2 = GaussianMixture(n_components=2, random_state=2, n_init=4).fit(X).bic(X)
        assert bic2 < bic1

    @pytest.mark.parametrize("ctype", ["full", "tied", "diag", "spherical"])
    def test_covariance_types(self, ctype):
        rng = np.random.default_rng(13)
        X = rng.standard_normal((300, 3))
        gm = GaussianMixture(covariance_type=ctype, random_state=3).fit(X)
        assert gm.covariances_.shape == (1, 3, 3)
        assert np.all(np.isfinite(gm.covariances_))
        assert np.isfinite(gm.bic(X))

    def test_sample_weight_honored(self):
        X = two_blobs(seed=14)
        w = np.concatenate([np.ones(200), np.zeros(200)])
        gm = GaussianMixture(n_components=1, random_state=4).fit(X, sample_weight=w)
        np.testing.assert_allclose(gm.means_[0], [0.0, 0.0], atol=0.2)

    def test_unfitted_raises(self):
        gm = GaussianMixture()
        with pytest.raises(ValueError, match="not fitted"):
            gm.predict(np.zeros((4, 2)))
        with pytest.raises(ValueError, match="not fitted"):
            gm.bic(np.zeros((4, 2)))

    def test_bad_covariance_type_raises(self):
        with pytest.raises(ValueError, match="covariance_type"):
            GaussianMixture(covariance_type="banana")


class TestHGM:
    def test_splits_bimodal(self):
        X = two_blobs(seed=7, sep=8.0)
        hgm = HierarchicalGaussianMixture(k_max=8)
        hgm.fit(X)
        assert hgm.n_clusters_ == 2
        labels = hgm.labels_
        assert abs(labels[:200].mean() - labels[200:].mean()) > 0.9

    def test_no_split_unimodal(self):
        rng = np.random.default_rng(8)
        X = rng.standard_normal((300, 2))
        hgm = HierarchicalGaussianMixture(k_max=8)
        hgm.fit(X)
        assert hgm.n_clusters_ == 1

    def test_min_points_blocks_split(self):
        X = two_blobs(n=12, seed=9, sep=8.0)
        hgm = HierarchicalGaussianMixture(min_points=20, k_max=8)
        hgm.fit(X)
        assert hgm.n_clusters_ == 1

    def test_threshold_modifier_blocks_split(self):
        X = two_blobs(seed=10, sep=5.0)
        hgm = HierarchicalGaussianMixture(threshold_modifier=1e6, k_max=8)
        hgm.fit(X)
        assert hgm.n_clusters_ == 1

    def test_invalid_threshold_raises(self):
        with pytest.raises(ValueError):
            HierarchicalGaussianMixture(threshold_modifier=0.0)

    def test_normalize_path(self):
        X = two_blobs(seed=11, sep=8.0) * np.array([1000.0, 0.001])
        hgm = HierarchicalGaussianMixture(normalize=True, k_max=8)
        hgm.fit(X)
        assert hgm.n_clusters_ == 2
        pred = hgm.predict(X)
        assert abs(pred[:200].mean() - pred[200:].mean()) > 0.9

    def test_predict_proba_sums_to_one(self):
        X = two_blobs(seed=12, sep=8.0)
        hgm = HierarchicalGaussianMixture(k_max=8)
        hgm.fit(X)
        proba = hgm.predict_proba(X)
        assert proba.shape == (400, hgm.n_clusters_)
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-4)

    def test_weighted_fit(self):
        X = two_blobs(seed=13, sep=8.0)
        # Zero weight on second blob -> no split
        w = np.concatenate([np.ones(200), np.zeros(200) + 1e-12])
        hgm = HierarchicalGaussianMixture(k_max=8)
        hgm.fit(X, sample_weight=w)
        assert hgm.n_clusters_ == 1

    def test_masked_fit(self):
        X = np.concatenate([two_blobs(seed=14, sep=8.0), np.full((50, 2), 100.0)])
        mask = np.arange(450) < 400
        hgm = HierarchicalGaussianMixture(k_max=8)
        hgm.fit(X, mask=mask)
        assert hgm.n_clusters_ == 2

    def test_k_max_cap(self):
        rng = np.random.default_rng(15)
        # 4 well-separated blobs but k_max=2
        X = np.concatenate(
            [rng.standard_normal((100, 2)) * 0.2 + c for c in [0, 10, 20, 30]]
        )
        hgm = HierarchicalGaussianMixture(k_max=2)
        hgm.fit(X)
        assert hgm.n_clusters_ <= 2


class TestNInitRestarts:
    def test_best_of_n_lower_bound_not_worse(self):
        # Best-of-n restarts must never return a worse weighted lower bound
        # than a single run with the same key (reference cluster.py:97-131).
        X = jnp.asarray(two_blobs(seed=3))
        w = jnp.ones(400)
        key = jax.random.PRNGKey(5)
        single = gmm_fit(key, X, w, 2)
        multi = gmm_fit(key, X, w, 2, n_init=5)
        assert float(multi.lower_bound) >= float(single.lower_bound) - 1e-6

    def test_n_init_plumbed_through_hgm(self):
        # The class-level n_init parameter must actually reach the EM fits
        # (round-1 review: it was stored and ignored).
        X = two_blobs(seed=4)
        h = HierarchicalGaussianMixture(n_init=3, k_max=4)
        h.fit(X)
        assert h.n_clusters_ == 2
        labels = h.predict(X)
        assert len(np.unique(labels)) == 2


class TestScoresReusePaths:
    """The round-3 one-density-pass restructuring must agree exactly with
    the reference-shaped standalone functions it replaced."""

    def test_bic_from_lik_matches_gmm_bic(self):
        from tempest_tpu.cluster import _bic_from_lik, _gmm_fit_scores

        X = jnp.asarray(two_blobs(150, seed=3))
        w = jnp.asarray(np.random.default_rng(3).exponential(size=300))
        p, scores, lik = _gmm_fit_scores(jax.random.PRNGKey(0), X, w, 2)
        mask = jnp.arange(300) < 260  # uneven leaf membership
        ref = gmm_bic(p, X, mask, "full")
        fast = _bic_from_lik(lik, mask, 2, X.shape[1], "full")
        assert np.isclose(float(ref), float(fast), rtol=1e-5)

    def test_child_from_scores_matches_gmm_predict(self):
        from tempest_tpu.cluster import _EPS, _gmm_fit_scores

        X = jnp.asarray(two_blobs(120, seed=4))
        w = jnp.ones((240,))
        p, scores, _ = _gmm_fit_scores(jax.random.PRNGKey(1), X, w, 2)
        child = jnp.argmax(jnp.log(p.weights + _EPS)[:, None] + scores, axis=0)
        ref = gmm_predict(p, X)
        assert np.array_equal(np.asarray(child), np.asarray(ref))

    def test_single_component_scores_match_wrapper(self):
        from tempest_tpu.cluster import (
            _single_component_fit,
            _single_component_fit_scores,
        )

        X = jnp.asarray(two_blobs(100, seed=5))
        w = jnp.asarray(np.random.default_rng(5).exponential(size=200))
        pw = _single_component_fit(X, w)
        ps, lik = _single_component_fit_scores(X, w)
        assert np.allclose(np.asarray(pw.means), np.asarray(ps.means))
        assert np.isclose(float(pw.lower_bound), float(ps.lower_bound))
        assert lik.shape == (200,) and bool(jnp.all(lik >= 0.0))

    def test_em_one_pass_convergence_keeps_converged_params(self):
        # When the bound improvement falls below tol, the loop must retain
        # the PRE-M-step (converged) parameters, not apply a further step.
        X = jnp.asarray(two_blobs(200, seed=6))
        p_tight = gmm_fit(jax.random.PRNGKey(2), X, jnp.ones(400), 2, tol=1e-3)
        p_loose = gmm_fit(jax.random.PRNGKey(2), X, jnp.ones(400), 2, tol=10.0)
        # loose tol stops almost immediately; both must still be valid fits
        for p in (p_tight, p_loose):
            assert np.all(np.isfinite(np.asarray(p.means)))
            assert float(jnp.sum(p.weights)) == pytest.approx(1.0, abs=1e-5)
        assert int(p_loose.n_iter) <= int(p_tight.n_iter)
