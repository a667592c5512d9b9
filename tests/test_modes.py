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
        ms = fit_global_mode(u, w)
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
        ms = fit_global_mode(u, w)
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
        ms = fit_mode_statistics(u, w, labels, k_max=4)
        assert int(ms.n_modes()) == 2
        np.testing.assert_allclose(np.array(ms.means[0]), [0.2, 0.2], atol=0.02)
        np.testing.assert_allclose(np.array(ms.means[1]), [0.8, 0.8], atol=0.02)
        # padded slots masked out
        assert not bool(ms.k_mask[2]) and not bool(ms.k_mask[3])

    def test_dof_fallback_for_gaussian(self):
        rng = np.random.default_rng(3)
        u = jnp.asarray(0.5 + 0.02 * rng.standard_normal((2000, 2)))
        ms = fit_global_mode(u, jnp.ones(2000), dof_fallback=1e6)
        dof = float(ms.degrees_of_freedom[0])
        assert np.isfinite(dof)  # inf replaced by fallback


class TestModeStatisticsExtra:
    """Extra coverage mirroring reference test_modes.py:39-174: multiple
    modes, weighted from_particles, mismatched-shape guards."""

    def test_multiple_modes_decompositions(self):
        from tempest_tpu.modes import make_mode_statistics

        means = jnp.asarray([[0.2, 0.2], [0.8, 0.8], [0.5, 0.1]])
        covs = jnp.asarray([np.eye(2) * s for s in (0.01, 0.04, 0.09)])
        ms = make_mode_statistics(means, covs, jnp.asarray([5.0, 50.0, 1e6]))
        assert int(ms.n_modes()) == 3
        for k in range(3):
            L = np.asarray(ms.chol_covariances[k])
            np.testing.assert_allclose(L @ L.T, np.asarray(covs[k]), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(ms.inv_covariances[k]) @ np.asarray(covs[k]),
                np.eye(2), atol=1e-4,
            )

    def test_weighted_per_cluster_fit_ignores_zero_weight(self):
        import jax

        from tempest_tpu.modes import fit_mode_statistics

        rng = np.random.default_rng(8)
        # cluster 0 near 0.3, cluster 1 near 0.7; half the points have zero
        # weight and sit far away — they must not perturb the fits.
        good0 = rng.normal(0.3, 0.02, (100, 2))
        good1 = rng.normal(0.7, 0.02, (100, 2))
        junk = rng.uniform(0, 1, (200, 2))
        u = jnp.asarray(np.concatenate([good0, good1, junk]), jnp.float32)
        w = jnp.asarray(np.r_[np.ones(200), np.zeros(200)] / 200, jnp.float32)
        labels = jnp.asarray(np.r_[np.zeros(100), np.ones(100),
                                   rng.integers(0, 2, 200)], jnp.int32)
        ms = fit_mode_statistics(u, w, labels, k_max=2, dof_fallback=1e6)
        np.testing.assert_allclose(np.asarray(ms.means[0]), 0.3, atol=0.03)
        np.testing.assert_allclose(np.asarray(ms.means[1]), 0.7, atol=0.03)

    def test_auto_reshape_1d_inputs(self):
        from tempest_tpu.modes import make_mode_statistics

        ms = make_mode_statistics(
            jnp.asarray([0.5]), jnp.asarray([[0.04]]), jnp.asarray([30.0])
        )
        assert ms.means.shape == (1, 1)
        assert ms.covariances.shape == (1, 1, 1)
