"""Edge cases and boundary conditions through the full public API.

Port of the reference's tests/test_edge_cases.py:1-194 coverage (1-D
problems, narrow likelihoods, tiny ensembles, boundary types, kwargs,
non-vectorized dispatch) with stronger, quantitative assertions where an
analytic answer exists, plus the n_candidates saturation check the round-1
review asked for (bounded-redraw bias near walls).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempest_tpu import Sampler

_LOG2PI = float(np.log(2.0 * np.pi))


def _gauss_prior(u):
    # Unit cube -> standard normal via the probit function.
    return jnp.asarray(jax.scipy.stats.norm.ppf(u))


def _gauss_logl(x):
    return jnp.sum(-0.5 * _LOG2PI - 0.5 * x**2, axis=-1)


class TestSingleDimension:
    def test_1d_run_and_evidence(self):
        # 1-D standard normal likelihood against a standard normal prior:
        # Z = integral N(x)N(x) dx = 1/(2 sqrt(pi)).
        analytic = -0.5 * np.log(4.0 * np.pi)
        s = Sampler(
            _gauss_prior,
            _gauss_logl,
            n_dim=1,
            n_particles=64,
            vectorize=True,
            clustering=False,
            random_state=0,
        )
        s.run(n_total=256, progress=False)
        assert s.n_dim == 1
        assert s.beta == 1.0
        assert abs(s.logz - analytic) < 0.35, (s.logz, analytic)
        x, w, logl = s.posterior()
        assert x.shape[1] == 1
        # posterior N(0, 1/2): weighted mean ~ 0, var ~ 0.5
        mean = float(np.average(x[:, 0], weights=w))
        var = float(np.average((x[:, 0] - mean) ** 2, weights=w))
        assert abs(mean) < 0.2
        assert abs(var - 0.5) < 0.2

    def test_1d_with_clustering(self):
        s = Sampler(
            _gauss_prior,
            _gauss_logl,
            n_dim=1,
            n_particles=64,
            vectorize=True,
            clustering=True,
            random_state=1,
        )
        s.run(n_total=128, progress=False)
        assert s.beta == 1.0


class TestNarrowLikelihood:
    def test_sigma_0p1_evidence(self):
        # N(0, 0.1^2) likelihood, standard normal prior:
        # Z = N(0 | 0, 1 + 0.01) => logZ = -0.5*log(2*pi*1.01).
        analytic = -0.5 * np.log(2 * np.pi * 1.01)

        def narrow(x):
            return jnp.sum(
                -0.5 * jnp.log(2 * jnp.pi * 0.01) - 0.5 * x**2 / 0.01, axis=-1
            )

        s = Sampler(
            _gauss_prior,
            narrow,
            n_dim=2,
            n_particles=128,
            vectorize=True,
            clustering=False,
            random_state=0,
        )
        s.run(n_total=512, progress=False)
        assert s.beta == 1.0
        assert abs(s.logz - 2 * analytic) < 0.5, (s.logz, 2 * analytic)
        x, w, _ = s.posterior()
        # posterior concentrates in the narrow mode
        assert float(np.average(np.abs(x), axis=0, weights=w).mean()) < 0.3


class TestTinyEnsembles:
    def test_n_particles_8(self):
        s = Sampler(
            _gauss_prior,
            _gauss_logl,
            n_dim=2,
            n_particles=8,
            vectorize=True,
            clustering=False,
            random_state=0,
        )
        s.run(n_total=32, progress=False)
        assert s.n_particles == 8
        assert s.beta == 1.0


class TestLikelihoodDispatch:
    def test_kwargs_plumbed(self):
        def scaled(x, scale=1.0):
            return jnp.sum(-0.5 * _LOG2PI - 0.5 * (x / scale) ** 2, axis=-1)

        s = Sampler(
            _gauss_prior,
            scaled,
            log_likelihood_kwargs={"scale": 2.0},
            n_dim=2,
            n_particles=64,
            vectorize=True,
            clustering=False,
            random_state=0,
        )
        s.run(n_total=128, progress=False)
        # Z = prod N(0 | 0, 1+4)/... => per-dim logZ = -0.5*log(2*pi*5)
        # (likelihood here is an UNNORMALIZED N(0,4): density
        # N(x;0,4)*2 per dim) — just check finiteness + convergence.
        assert s.beta == 1.0
        assert np.isfinite(s.logz)

    def test_per_point_likelihood(self):
        def single(x):  # operates on one point (d,), vmapped internally
            return jnp.sum(-0.5 * _LOG2PI - 0.5 * x**2)

        s = Sampler(
            _gauss_prior,
            single,
            n_dim=2,
            n_particles=16,
            vectorize=False,
            clustering=False,
            random_state=0,
        )
        s.run(n_total=64, progress=False)
        assert s.beta == 1.0


class TestBoundaryConditions:
    def test_periodic_run_stays_in_cube(self):
        # Von-Mises-like target peaked at the wrap point so mass straddles
        # the periodic boundary.
        def vm_logl(x):
            return jnp.sum(3.0 * jnp.cos(x), axis=-1)  # peak at 0 == 2*pi

        s = Sampler(
            lambda u: 2.0 * jnp.pi * u,
            vm_logl,
            n_dim=2,
            n_particles=64,
            vectorize=True,
            periodic=[0, 1],
            clustering=False,
            random_state=0,
        )
        s.run(n_total=256, progress=False)
        assert s.beta == 1.0
        u_hist = np.asarray(s.state.hist.flat_u())
        valid = np.asarray(s.state.hist.sample_mask()).reshape(-1)
        assert (u_hist[valid] >= 0).all() and (u_hist[valid] <= 1).all()
        # posterior mass concentrates near the wrap point 0/2*pi
        x, w, _ = s.posterior()
        dist = np.minimum(x, 2 * np.pi - x)  # distance to the peak
        assert float(np.average(dist, axis=0, weights=w).mean()) < 0.8

    def test_reflective_run(self):
        s = Sampler(
            _gauss_prior,
            _gauss_logl,
            n_dim=2,
            n_particles=64,
            vectorize=True,
            reflective=[0],
            clustering=False,
            random_state=0,
        )
        s.run(n_total=128, progress=False)
        assert s.beta == 1.0
        u_hist = np.asarray(s.state.hist.flat_u())
        valid = np.asarray(s.state.hist.sample_mask()).reshape(-1)
        assert (u_hist[valid] >= 0).all() and (u_hist[valid] <= 1).all()

    def test_mixed_boundaries(self):
        s = Sampler(
            lambda u: u,
            lambda x: -0.5 * jnp.sum((x - 0.5) ** 2, axis=-1) / 0.01,
            n_dim=3,
            n_particles=64,
            vectorize=True,
            periodic=[0],
            reflective=[1],
            clustering=False,
            random_state=0,
        )
        s.run(n_total=128, progress=False)
        assert s.beta == 1.0


class TestBoundedRedrawBias:
    """The bounded n_candidates redraw (mcmc.py propose()) must not bias a
    wall-hugging posterior, and the knob must be plumbed (round-1 review,
    weak item 4)."""

    def _run(self, n_candidates, seed=0):
        # Posterior pressed against the u=0 wall: exponential-like decay
        # away from the boundary in every coordinate.
        s = Sampler(
            lambda u: u,
            lambda x: jnp.sum(-20.0 * x, axis=-1),
            n_dim=2,
            n_particles=128,
            vectorize=True,
            clustering=False,
            random_state=seed,
            n_candidates=n_candidates,
        )
        s.run(n_total=512, progress=False)
        x, w, _ = s.posterior()
        return s, float(np.average(x, axis=0, weights=w).mean())

    def test_wall_posterior_matches_truncated_exponential(self):
        # Truncated exponential on [0,1], rate 20: mean ~ 1/20.
        s, mean = self._run(n_candidates=8)
        assert s.beta == 1.0
        assert abs(mean - 0.05) < 0.015, mean
        # analytic logZ: (1 - exp(-20))/20 per dim
        analytic = 2 * float(np.log((1 - np.exp(-20.0)) / 20.0))
        assert abs(s.logz - analytic) < 0.5

    def test_more_candidates_agree(self):
        # Saturating the candidate count must not shift the posterior:
        # 8 vs 64 candidates give statistically identical means.
        _, mean8 = self._run(8, seed=3)
        _, mean64 = self._run(64, seed=3)
        assert abs(mean8 - mean64) < 0.01, (mean8, mean64)
