"""Sharded execution over a device mesh.

The reference's only distribution mechanism is the likelihood fan-out
(reference core.py:430-440); here the whole pipeline runs SPMD with the
particle axis sharded over a mesh (tempest_tpu/parallel/mesh.py). These
tests run on the 8-virtual-device CPU backend from conftest.py and check
that mesh execution (a) works end-to-end through the public API, and
(b) agrees with single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempest_tpu import Sampler
from tempest_tpu.parallel.mesh import make_particle_mesh, shard_history


N_DIM = 4
ANALYTIC_LOGZ = -N_DIM * np.log(20.0)


def prior_transform(u):
    return 20.0 * u - 10.0


def log_likelihood(x):
    return -0.5 * jnp.sum(x * x, axis=-1) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)


def _build(mesh, seed=11, clustering=False):
    return Sampler(
        prior_transform,
        log_likelihood,
        n_dim=N_DIM,
        n_particles=256,
        vectorize=True,
        clustering=clustering,
        random_state=seed,
        mesh=mesh,
    )


def test_mesh_run_end_to_end():
    mesh = make_particle_mesh(8)
    s = _build(mesh)
    s.run(n_total=512, progress=False)
    logz, _ = s.evidence()
    assert abs(logz - ANALYTIC_LOGZ) < 0.5
    assert s.beta == 1.0
    # history stayed sharded over the particle axis
    sh = s.state.hist.u.sharding
    assert not sh.is_fully_replicated


def test_mesh_matches_single_device():
    mesh = make_particle_mesh(8)
    s1 = _build(None, seed=5)
    s8 = _build(mesh, seed=5)
    s1.run(n_total=512, progress=False)
    s8.run(n_total=512, progress=False)
    # Same key stream + same math => same ladder up to reduction-order
    # float noise; logZ must agree tightly, trajectories statistically.
    assert abs(s1.logz - s8.logz) < 0.05
    assert int(s1.state.hist.t) == int(s8.state.hist.t)
    np.testing.assert_allclose(
        np.asarray(s1.state.hist.beta), np.asarray(s8.state.hist.beta),
        atol=1e-3,
    )


def test_mesh_with_clustering():
    mesh = make_particle_mesh(8)
    s = _build(mesh, seed=2, clustering=True)
    s.run(n_total=512, progress=False)
    assert s.beta == 1.0
    assert abs(s.logz - ANALYTIC_LOGZ) < 0.5


def test_mesh_divisibility_validated():
    mesh = make_particle_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        Sampler(
            prior_transform,
            log_likelihood,
            n_dim=N_DIM,
            n_particles=100,  # not divisible by 8
            vectorize=True,
            mesh=mesh,
        )


def test_capacity_growth_preserves_sharding():
    mesh = make_particle_mesh(8)
    s = Sampler(
        prior_transform,
        log_likelihood,
        n_dim=N_DIM,
        n_particles=64,
        vectorize=True,
        clustering=False,
        random_state=0,
        mesh=mesh,
        history_capacity=2,  # force growth almost immediately
    )
    s.run(n_total=256, progress=False)
    assert int(s.state.hist.t) > 2  # growth happened
    assert not s.state.hist.u.sharding.is_fully_replicated
    assert abs(s.logz - ANALYTIC_LOGZ) < 0.5
