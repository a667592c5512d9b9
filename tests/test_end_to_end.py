"""End-to-end accuracy: the reference's own acceptance bar.

Port of reference tests/test_end_to_end.py:14-76 — a 10-D diagonal
Gaussian in U(-10,10)^10: posterior mean within 0.25, variance within 0.5,
logZ within 0.5 of the analytic -10*log(20) = -29.957, final beta > 0.99,
MCMC acceptance > 0.1.
"""

import numpy as np
import jax.numpy as jnp

from tempest_tpu import Sampler

N_DIM = 10
ANALYTIC_LOGZ = -N_DIM * np.log(20.0)


def prior_transform(u):
    return -10.0 + 20.0 * u


def log_likelihood(x):
    return -0.5 * jnp.sum(x * x, axis=-1) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)


def test_10d_gaussian_end_to_end():
    s = Sampler(
        prior_transform,
        log_likelihood,
        n_dim=N_DIM,
        n_particles=512,
        vectorize=True,
        clustering=False,
        random_state=0,
        history_capacity=64,
    )
    s.run(n_total=2048, progress=False, on_device=True)

    assert s.beta > 0.99
    logz, _ = s.evidence()
    assert abs(logz - ANALYTIC_LOGZ) < 0.5

    x, w, logl = s.posterior()
    mean = np.average(x, axis=0, weights=w)
    var = np.average((x - mean) ** 2, axis=0, weights=w)
    np.testing.assert_allclose(mean, 0.0, atol=0.25)
    np.testing.assert_allclose(var, 1.0, atol=0.5)

    acc = float(s.state.cur.acceptance)
    assert acc > 0.1
