"""ModeStatistics tests — ports of reference tests/test_modes.py semantics
adapted to the K_max-padded fixed-shape design."""

import jax
import jax.numpy as jnp
import numpy as np

from tempest_tpu.modes import (
    fit_global_mode,
    fit_mode_statistics,
    identity_mode_statistics,
    make_mode_statistics,
)


class TestMakeModeStatistics:
    def test_shape_normalization_single_mode(self):
        ms = make_mode_statistics(
            means=jnp.zeros(3),
            covariances=jnp.eye(3),
            degrees_of_freedom=jnp.asarray(5.0),
        )
        assert ms.means.shape == (1, 3)
        assert ms.covariances.shape == (1, 3, 3)
        assert ms.degrees_of_freedom.shape == (1,)
        assert ms.k_max == 1

    def test_precomputed_decompositions(self):
        cov = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
        ms = make_mode_statistics(jnp.zeros(2), cov, jnp.asarray(10.0))
        np.testing.assert_allclose(
            np.array(ms.chol_covariances[0]) @ np.array(ms.chol_covariances[0]).T,
            np.array(cov),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.array(ms.inv_covariances[0]) @ np.array(cov), np.eye(2), atol=1e-5
        )

    def test_singular_covariance_regularized(self):
        cov = jnp.zeros((2, 2))  # singular
        ms = make_mode_statistics(jnp.zeros(2), cov, jnp.asarray(10.0))
        assert np.all(np.isfinite(np.array(ms.chol_covariances)))
        assert np.all(np.isfinite(np.array(ms.inv_covariances)))

    def test_identity_stats(self):
        ms = identity_mode_statistics(4, k_max=3)
        assert ms.k_max == 3
        assert int(ms.n_modes()) == 1
        np.testing.assert_allclose(np.array(ms.covariances[0]), np.eye(4))


class TestFitting:
    def test_global_fit_recovers_moments(self):
        rng = np.random.default_rng(0)
        u = jnp.asarray(0.5 + 0.05 * rng.standard_normal((1000, 2)))
        w = jnp.ones(1000)
        ms = fit_global_mode(jax.random.PRNGKey(0), u, w, n_resample=2000)
        assert int(ms.n_modes()) == 1
        np.testing.assert_allclose(np.array(ms.means[0]), [0.5, 0.5], atol=0.02)
        assert np.all(np.diag(np.array(ms.covariances[0])) < 0.02)

    def test_weighted_fit_respects_weights(self):
        # Two blobs, weight only on the first
        rng = np.random.default_rng(1)
        a = 0.2 + 0.01 * rng.standard_normal((500, 2))
        b = 0.8 + 0.01 * rng.standard_normal((500, 2))
        u = jnp.asarray(np.concatenate([a, b]))
        w = jnp.concatenate([jnp.ones(500), jnp.zeros(500)])
        ms = fit_global_mode(jax.random.PRNGKey(1), u, w, n_resample=1000)
        np.testing.assert_allclose(np.array(ms.means[0]), [0.2, 0.2], atol=0.02)

    def test_per_cluster_fit(self):
        rng = np.random.default_rng(2)
        a = 0.2 + 0.01 * rng.standard_normal((400, 2))
        b = 0.8 + 0.01 * rng.standard_normal((400, 2))
        u = jnp.asarray(np.concatenate([a, b]))
        w = jnp.ones(800)
        labels = jnp.concatenate(
            [jnp.zeros(400, jnp.int32), jnp.ones(400, jnp.int32)]
        )
        ms = fit_mode_statistics(
            jax.random.PRNGKey(2), u, w, labels, k_max=4, n_resample=800
        )
        assert int(ms.n_modes()) == 2
        np.testing.assert_allclose(np.array(ms.means[0]), [0.2, 0.2], atol=0.02)
        np.testing.assert_allclose(np.array(ms.means[1]), [0.8, 0.8], atol=0.02)
        # padded slots masked out
        assert not bool(ms.k_mask[2]) and not bool(ms.k_mask[3])

    def test_dof_fallback_for_gaussian(self):
        rng = np.random.default_rng(3)
        u = jnp.asarray(0.5 + 0.02 * rng.standard_normal((2000, 2)))
        ms = fit_global_mode(
            jax.random.PRNGKey(3), u, jnp.ones(2000), n_resample=2000, dof_fallback=1e6
        )
        dof = float(ms.degrees_of_freedom[0])
        assert np.isfinite(dof)  # inf replaced by fallback
