"""Oscillatory model fitting: parameter estimation + evidence on TPU.

Fits y = (A*x + B) * sin(omega*x + phi) + N(0, sigma^2) to synthetic data
with 5 unknown parameters. Reference anchor (BASELINE.md): the reference
implementation reports logZ = -26.36 +/- 0.11 and posterior parameters
A=0.443+/-0.058, B=2.106+/-0.099, omega=6.308+/-0.021, phi=0.728+/-0.042,
sigma=0.247+/-0.028 for this exact data-generating configuration
(/root/reference/docs/examples/oscillatory_fitting.md:108-110, 205-222).

Run: python examples/oscillatory_fitting.py
"""

import jax.numpy as jnp
import numpy as np

from tempest_tpu import Sampler

# ----------------------------------------------------------------------
# Synthetic data (same generative config as the reference example)
A_TRUE, B_TRUE = 0.5, 2.0
OMEGA_TRUE = 2 * np.pi
PHI_TRUE = np.pi / 4
SIGMA_TRUE = 0.25

rng = np.random.default_rng(42)
np.random.seed(42)
N_DATA = 50
x_np = np.linspace(0, 3, N_DATA)
y_np = (A_TRUE * x_np + B_TRUE) * np.sin(OMEGA_TRUE * x_np + PHI_TRUE)
y_np = y_np + np.random.normal(0, SIGMA_TRUE, size=N_DATA)

x_data = jnp.asarray(x_np)
y_data = jnp.asarray(y_np)


def log_likelihood(theta):
    """Gaussian log-likelihood of the oscillatory model, batched over
    particles (theta: [..., 5]); runs entirely on device."""
    A = theta[..., 0:1]
    B = theta[..., 1:2]
    omega = theta[..., 2:3]
    phi = theta[..., 3:4]
    sigma = theta[..., 4:5]
    y_pred = (A * x_data + B) * jnp.sin(omega * x_data + phi)
    resid = (y_data - y_pred) / sigma
    return -0.5 * jnp.sum(resid**2 + jnp.log(2 * jnp.pi * sigma**2), axis=-1)


def prior_transform(u):
    """Unit hypercube -> (A, B, omega, phi, sigma)."""
    return jnp.stack(
        [
            u[..., 0],  # A ~ U(0, 1)
            5.0 * u[..., 1],  # B ~ U(0, 5)
            8.0 * jnp.pi * u[..., 2],  # omega ~ U(0, 8*pi)
            2.0 * jnp.pi * u[..., 3],  # phi ~ U(0, 2*pi)
            10.0 ** (3.0 * u[..., 4] - 2.0),  # sigma ~ LogU(0.01, 10)
        ],
        axis=-1,
    )


def main():
    sampler = Sampler(
        prior_transform,
        log_likelihood,
        n_dim=5,
        n_particles=512,
        vectorize=True,
        random_state=42,
    )
    sampler.run(n_total=4096, progress=True)

    samples, weights, _ = sampler.posterior()
    logz, _ = sampler.evidence()
    samples = np.asarray(samples)
    weights = np.asarray(weights)

    mean = np.average(samples, axis=0, weights=weights)
    std = np.sqrt(np.average((samples - mean) ** 2, axis=0, weights=weights))
    names = ["A", "B", "omega", "phi", "sigma"]
    truth = [A_TRUE, B_TRUE, OMEGA_TRUE, PHI_TRUE, SIGMA_TRUE]

    print(f"\nlogZ = {logz:.2f}   (reference anchor: -26.36 +/- 0.11)")
    for n, m, s, t in zip(names, mean, std, truth):
        print(f"  {n:>5s} = {m:7.3f} +/- {s:.3f}   (true {t:.3f})")


if __name__ == "__main__":
    main()
