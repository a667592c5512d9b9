"""Student-t EM fit tests — ports of reference tests/test_student.py semantics."""

import jax.numpy as jnp
import numpy as np

from tempest_tpu.student import fit_mvstud


class TestFitMVStud:
    def test_gaussian_data_large_nu(self):
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.standard_normal((2000, 2)))
        mu, Sigma, nu = fit_mvstud(data)
        # Gaussian data: nu should be very large or inf (Gaussian limit)
        assert float(nu) > 20.0 or np.isinf(float(nu))
        np.testing.assert_allclose(np.array(mu), [0.0, 0.0], atol=0.15)
        np.testing.assert_allclose(np.array(Sigma), np.eye(2), atol=0.2)

    def test_heavy_tailed_data_small_nu(self):
        rng = np.random.default_rng(1)
        nu_true = 3.0
        g = rng.standard_normal((4000, 2))
        s = rng.chisquare(nu_true, size=4000) / nu_true
        data = jnp.asarray(g / np.sqrt(s)[:, None])
        mu, Sigma, nu = fit_mvstud(data)
        assert np.isfinite(float(nu))
        assert 1.0 < float(nu) < 10.0

    def test_1d_data(self):
        rng = np.random.default_rng(2)
        data = jnp.asarray(rng.standard_normal((500, 1)) * 2.0 + 3.0)
        mu, Sigma, nu = fit_mvstud(data)
        assert mu.shape == (1,)
        assert Sigma.shape == (1, 1)
        np.testing.assert_allclose(float(mu[0]), 3.0, atol=0.3)

    def test_constant_data_no_nan(self):
        data = jnp.ones((100, 3))
        mu, Sigma, nu = fit_mvstud(data)
        assert np.all(np.isfinite(np.array(mu)))
        assert np.all(np.isfinite(np.array(Sigma)))

    def test_positive_definite_output(self):
        rng = np.random.default_rng(3)
        # Degenerate: data on a line
        t = rng.standard_normal(200)
        data = jnp.asarray(np.stack([t, 2 * t], axis=1))
        mu, Sigma, nu = fit_mvstud(data)
        eigs = np.linalg.eigvalsh(np.array(Sigma))
        assert np.all(eigs > 0)

    def test_reproducibility(self):
        rng = np.random.default_rng(4)
        data = jnp.asarray(rng.standard_normal((300, 2)))
        out1 = fit_mvstud(data)
        out2 = fit_mvstud(data)
        np.testing.assert_array_equal(np.array(out1[0]), np.array(out2[0]))
        np.testing.assert_array_equal(np.array(out1[1]), np.array(out2[1]))

    def test_mean_recovery_offset(self):
        rng = np.random.default_rng(5)
        data = jnp.asarray(rng.standard_normal((1000, 3)) + np.array([1.0, -2.0, 0.5]))
        mu, Sigma, nu = fit_mvstud(data)
        np.testing.assert_allclose(np.array(mu), [1.0, -2.0, 0.5], atol=0.2)


class TestNuRootAccuracy:
    def test_root_matches_dense_scan(self):
        """The multisection root agrees with a dense scan of the same
        stationarity equation (cancellation-free form) to <1e-3 log-error."""
        from tempest_tpu.student import _nu_objective, _opt_nu

        rng = np.random.default_rng(1)
        for true_nu in (3.0, 8.0):
            x = rng.standard_t(true_nu, (2048, 4)).astype(np.float32)
            xc = x - x.mean(0)
            cov = (xc.T @ xc) / len(x)
            delta = jnp.asarray(
                np.einsum("ni,ij,nj->n", xc, np.linalg.inv(cov), xc), jnp.float32
            )
            grid = jnp.linspace(-18.0, 13.8, 20001)
            f = np.asarray(_nu_objective(grid, delta, 4, len(x)))
            i = np.argmax(f < 0)
            assert i > 0, "expected a sign change for heavy-tailed data"
            root_dense = float(np.exp(0.5 * (grid[i - 1] + grid[i])))
            nu = float(_opt_nu(delta, 4, len(x)))
            assert abs(np.log(nu) - np.log(root_dense)) < 1e-3

    def test_finite_nu_for_heavy_tails_unlike_reference(self):
        """Regression: heavy-tailed data must yield a FINITE nu (the
        reference's limit test is numerically degenerate and always returns
        inf; see module docstring)."""
        from tempest_tpu.student import fit_mvstud

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_t(3.0, (4096, 5)), jnp.float32)
        _, _, nu = fit_mvstud(x)
        assert np.isfinite(float(nu))
        assert float(nu) < 15.0


class TestFitMVStudExtra:
    """Extra coverage mirroring reference test_student.py:164-231:
    outliers, correlated data, different scales."""

    def test_outliers_give_heavy_tails(self):
        # Gaussian bulk + 5% gross outliers: a robust Student-t fit should
        # land on a finite, smallish nu and keep the mean near the bulk.
        rng = np.random.default_rng(4)
        bulk = rng.standard_normal((1900, 2))
        outl = rng.standard_normal((100, 2)) * 15.0
        data = jnp.asarray(np.concatenate([bulk, outl]))
        mu, Sigma, nu = fit_mvstud(data)
        assert np.isfinite(float(nu)) and float(nu) < 20.0
        np.testing.assert_allclose(np.array(mu), [0.0, 0.0], atol=0.25)

    def test_correlated_data_covariance_recovered(self):
        rng = np.random.default_rng(5)
        L = np.array([[1.0, 0.0], [0.9, 0.3]])
        data = jnp.asarray(rng.standard_normal((4000, 2)) @ L.T)
        mu, Sigma, nu = fit_mvstud(data)
        target = L @ L.T
        # correlation direction recovered (scale may differ slightly with nu)
        corr_fit = float(Sigma[0, 1] / np.sqrt(Sigma[0, 0] * Sigma[1, 1]))
        corr_true = target[0, 1] / np.sqrt(target[0, 0] * target[1, 1])
        assert abs(corr_fit - corr_true) < 0.05

    def test_very_different_scales(self):
        rng = np.random.default_rng(6)
        data = rng.standard_normal((3000, 2)) * np.array([1e-3, 1e3])
        mu, Sigma, nu = fit_mvstud(jnp.asarray(data))
        assert np.all(np.isfinite(np.array(Sigma)))
        # each marginal variance right to within a factor ~2
        assert 0.5e-6 < float(Sigma[0, 0]) < 2e-6
        assert 0.5e6 < float(Sigma[1, 1]) < 2e6

    def test_tiny_sample(self):
        # n barely above d: must not crash, must return PD covariance
        rng = np.random.default_rng(7)
        data = jnp.asarray(rng.standard_normal((5, 3)))
        mu, Sigma, nu = fit_mvstud(data)
        eig = np.linalg.eigvalsh(np.array(Sigma))
        assert np.all(eig > 0)
