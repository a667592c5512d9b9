"""Bimodal Gaussian mixture: mode discovery with hierarchical clustering.

Two well-separated Gaussians; the clustered Student-t proposals let the
sampler mutate each mode with its own geometry, and the persistent history
keeps both modes' mass in the evidence.

Run:  python examples/gaussian_mixture.py
"""

import jax.numpy as jnp
import numpy as np

from tempest_tpu import Sampler

N_DIM = 2
SEP = 5.0
SIGMA = 0.5


def prior_transform(u):
    return -10.0 + 20.0 * u


def log_likelihood(x):
    norm = -0.5 * N_DIM * jnp.log(2 * jnp.pi * SIGMA**2)
    a = -0.5 * jnp.sum((x - SEP) ** 2) / SIGMA**2
    b = -0.5 * jnp.sum((x + SEP) ** 2) / SIGMA**2
    return jnp.logaddexp(a, b) - jnp.log(2.0) + norm


def main():
    sampler = Sampler(
        prior_transform,
        log_likelihood,
        n_dim=N_DIM,
        n_particles=512,
        clustering=True,          # discover the two modes
        random_state=1,
    )
    sampler.run(n_total=4096)

    x, w, _ = sampler.posterior()
    frac_pos = w[x[:, 0] > 0].sum() / w.sum()
    logz, _ = sampler.evidence()

    # Likelihood is normalized => logZ should equal the prior log-volume
    print(f"logZ       : {logz:.3f}   (analytic {-N_DIM * np.log(20.0):.3f})")
    print(f"mode split : {frac_pos:.3f} / {1 - frac_pos:.3f}   (expected 0.5 / 0.5)")


if __name__ == "__main__":
    main()
