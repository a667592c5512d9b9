"""Blobs: tracking derived quantities through the run.

The likelihood returns (logl, blobs); the blobs ride the persistent
history and come back weighted with the posterior — here used to get the
posterior predictive at a new input without re-evaluating the model.

Run:  python examples/blobs.py
"""

import jax.numpy as jnp
import numpy as np

from tempest_tpu import Sampler

# data: y = m x + c + noise
rng = np.random.default_rng(3)
x_data = jnp.asarray(np.linspace(0, 1, 20), jnp.float32)
y_data = jnp.asarray(2.0 * np.asarray(x_data) + 1.0 + rng.normal(0, 0.1, 20), jnp.float32)
X_NEW = 2.0  # extrapolation point


def prior_transform(u):
    return -5.0 + 10.0 * u  # m, c ~ U(-5, 5)


def log_likelihood(theta):
    m, c = theta[0], theta[1]
    model = m * x_data + c
    logl = jnp.sum(-0.5 * ((y_data - model) / 0.1) ** 2)
    y_new = m * X_NEW + c            # derived quantity: prediction at X_NEW
    chi2 = jnp.sum(((y_data - model) / 0.1) ** 2)
    return logl, jnp.stack([y_new, chi2])


def main():
    sampler = Sampler(
        prior_transform,
        log_likelihood,
        n_dim=2,
        n_particles=256,
        blobs_dtype="float32",
        random_state=0,
    )
    sampler.run(n_total=2048)

    x, w, logl, blobs = sampler.posterior(return_blobs=True)
    y_pred = np.average(blobs[:, 0], weights=w)
    y_std = np.sqrt(np.average((blobs[:, 0] - y_pred) ** 2, weights=w))
    print(f"posterior predictive y({X_NEW}) = {y_pred:.3f} +/- {y_std:.3f}  (truth 5.0)")
    print(f"mean chi2 = {np.average(blobs[:, 1], weights=w):.1f}  (~n_data = 20)")


if __name__ == "__main__":
    main()
