"""Multimodal end-to-end validation (round-1 review item 4).

A 2-mode 10-D Gaussian mixture through the FULL sampler with clustering on:
the hierarchical GMM must discover both modes, the posterior must put
~equal mass on each, and the evidence must match the analytic value.
Reference bar: /root/reference/docs/examples/gaussian_mixture.md.

Also runs the same problem over the 8-virtual-device mesh (sharded
clustering + per-mode mutation).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tempest_tpu import Sampler
from tempest_tpu.parallel.mesh import make_particle_mesh

N_DIM = 10
SEP = 3.0  # mode centers at +-SEP in every coordinate
SIGMA = 0.5
# Prior U(-10,10)^10; likelihood = 0.5 N(+mu, sigma^2 I) + 0.5 N(-mu, sigma^2 I)
# (each component normalized) => Z = 1/20^10 (truncation negligible).
ANALYTIC_LOGZ = -N_DIM * float(np.log(20.0))


def prior_transform(u):
    return 20.0 * u - 10.0


def log_likelihood(x):
    norm = -0.5 * N_DIM * jnp.log(2 * jnp.pi * SIGMA**2)
    d1 = jnp.sum((x - SEP) ** 2, axis=-1)
    d2 = jnp.sum((x + SEP) ** 2, axis=-1)
    a = norm - 0.5 * d1 / SIGMA**2
    b = norm - 0.5 * d2 / SIGMA**2
    return jnp.logaddexp(a, b) - jnp.log(2.0)


def _build(mesh=None, seed=4):
    return Sampler(
        prior_transform,
        log_likelihood,
        n_dim=N_DIM,
        n_particles=256,
        vectorize=True,
        clustering=True,
        random_state=seed,
        mesh=mesh,
        # CPU-suite economy: preset capacity (no mid-run regrow recompiles)
        # and a k_max that keeps the vmapped leaf fits small.
        history_capacity=64,
        k_max=8,
    )


def _check(s):
    assert s.beta == 1.0
    assert abs(s.logz - ANALYTIC_LOGZ) < 0.5, (s.logz, ANALYTIC_LOGZ)

    # Both modes discovered by the clusterer.
    k = int(s.state.trainer.cluster_model.n_clusters())
    assert k >= 2, f"clustering found only {k} mode(s)"

    # Posterior mass splits ~50/50 between the modes, and each mode's
    # conditional mean sits at its center.
    x, w, _ = s.posterior()
    pos = x[:, 0] > 0
    mass_pos = float(np.sum(w[pos]))
    assert 0.3 < mass_pos < 0.7, f"mode mass {mass_pos:.3f}"
    mean_pos = np.average(x[pos], axis=0, weights=w[pos])
    mean_neg = np.average(x[~pos], axis=0, weights=w[~pos])
    np.testing.assert_allclose(mean_pos, SEP, atol=0.3)
    np.testing.assert_allclose(mean_neg, -SEP, atol=0.3)


@pytest.mark.slow
def test_bimodal_mixture_clustered():
    s = _build()
    s.run(n_total=512, progress=False)
    _check(s)


@pytest.mark.slow
def test_bimodal_mixture_clustered_on_mesh():
    # Smaller problem for the mesh variant: the 8-virtual-device CPU
    # backend executes the vmapped leaf EMs serially, so the 10-D version
    # above would take the better part of an hour here. 4-D keeps every
    # code path (sharded clustering, per-mode mutation, mode recovery)
    # while staying minutes-cheap; the 10-D mesh bar is covered on real
    # hardware by benchmarks/suite.py mixture10.
    d, sep, sigma = 4, 3.0, 0.5

    def loglike4(x):
        norm = -0.5 * d * jnp.log(2 * jnp.pi * sigma**2)
        a = norm - 0.5 * jnp.sum((x - sep) ** 2, axis=-1) / sigma**2
        b = norm - 0.5 * jnp.sum((x + sep) ** 2, axis=-1) / sigma**2
        return jnp.logaddexp(a, b) - jnp.log(2.0)

    s = Sampler(
        prior_transform,
        loglike4,
        n_dim=d,
        n_particles=128,
        vectorize=True,
        clustering=True,
        random_state=9,
        mesh=make_particle_mesh(8),
        history_capacity=64,
        k_max=4,
    )
    s.run(n_total=256, progress=False)
    assert s.beta == 1.0
    assert abs(s.logz - (-d * np.log(20.0))) < 0.5
    assert int(s.state.trainer.cluster_model.n_clusters()) >= 2
    x, w, _ = s.posterior()
    mass_pos = float(np.sum(w[x[:, 0] > 0]))
    assert 0.3 < mass_pos < 0.7, mass_pos
    assert not s.state.hist.u.sharding.is_fully_replicated
