"""Bayesian model comparison via evidence: oscillatory vs linear model.

Fits synthetic oscillatory data with two competing models and compares
them through the Bayes factor  BF = Z_osc / Z_lin.  This mirrors the
reference's model-comparison example problem (a sinusoid with noise,
fitted by a sinusoidal and a linear model).

Run:  python examples/model_comparison.py
"""

import jax.numpy as jnp
import numpy as np

from tempest_tpu import Sampler

# --- synthetic data ---------------------------------------------------
rng = np.random.default_rng(0)
N_DATA = 50
t_data = jnp.asarray(np.sort(rng.uniform(0.0, 2.0, N_DATA)), jnp.float32)
A_TRUE, B_TRUE, OMEGA_TRUE, PHI_TRUE, SIGMA_TRUE = 0.5, 2.0, 6.3, 0.7, 0.25
y_clean = A_TRUE * np.sin(OMEGA_TRUE * np.asarray(t_data) + PHI_TRUE) + B_TRUE
y_data = jnp.asarray(y_clean + rng.normal(0.0, SIGMA_TRUE, N_DATA), jnp.float32)


def _gauss_loglike(model, sigma):
    return jnp.sum(
        -0.5 * ((y_data - model) / sigma) ** 2
        - 0.5 * jnp.log(2 * jnp.pi * sigma**2)
    )


# --- model 1: oscillatory  y = A sin(w t + phi) + B -------------------
def prior_osc(u):
    A = 5.0 * u[0]                       # U(0, 5)
    B = -5.0 + 10.0 * u[1]               # U(-5, 5)
    omega = 10.0 * u[2]                  # U(0, 10)
    phi = 2.0 * jnp.pi * u[3]            # U(0, 2pi) — periodic
    sigma = 10.0 ** (-2.0 + 2.0 * u[4])  # LogU(0.01, 1)
    return jnp.stack([A, B, omega, phi, sigma])


def loglike_osc(x):
    A, B, omega, phi, sigma = x[0], x[1], x[2], x[3], x[4]
    return _gauss_loglike(A * jnp.sin(omega * t_data + phi) + B, sigma)


# --- model 2: linear  y = a t + b -------------------------------------
def prior_lin(u):
    a = -5.0 + 10.0 * u[0]
    b = -5.0 + 10.0 * u[1]
    sigma = 10.0 ** (-2.0 + 2.0 * u[2])
    return jnp.stack([a, b, sigma])


def loglike_lin(x):
    a, b, sigma = x[0], x[1], x[2]
    return _gauss_loglike(a * t_data + b, sigma)


def main():
    s_osc = Sampler(
        prior_osc, loglike_osc, n_dim=5, n_particles=512,
        periodic=[3], random_state=0,
    )
    s_osc.run(n_total=4096)
    logz_osc, _ = s_osc.evidence()

    s_lin = Sampler(
        prior_lin, loglike_lin, n_dim=3, n_particles=512, random_state=0,
    )
    s_lin.run(n_total=4096)
    logz_lin, _ = s_lin.evidence()

    log10_bf = (logz_osc - logz_lin) / np.log(10.0)
    print(f"logZ oscillatory : {logz_osc:.2f}")
    print(f"logZ linear      : {logz_lin:.2f}")
    print(f"log10 Bayes factor (osc/lin): {log10_bf:.2f}")

    x, w, _ = s_osc.posterior()
    mean = np.average(x, axis=0, weights=w)
    std = np.sqrt(np.average((x - mean) ** 2, axis=0, weights=w))
    names = ["A", "B", "omega", "phi", "sigma"]
    truth = [A_TRUE, B_TRUE, OMEGA_TRUE, PHI_TRUE, SIGMA_TRUE]
    for n, m, s, tv in zip(names, mean, std, truth):
        print(f"  {n:6s} = {m:7.3f} +/- {s:.3f}   (truth {tv})")


if __name__ == "__main__":
    main()
