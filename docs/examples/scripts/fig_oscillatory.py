"""Figures: oscillatory model fit (docs/examples/oscillatory_fitting.md).

Generates:
- `oscillatory_fit.png` — data, true curve, and the posterior-predictive
  band drawn from weighted posterior samples;
- `oscillatory_corner.png` — weighted pair grid of the 5 parameters.

Same generative configuration as examples/oscillatory_fitting.py (and the
reference's documented anchor logZ = -26.36 +/- 0.11).
"""

from common import force_cpu, pair_grid, savefig

force_cpu()

import jax.numpy as jnp
import numpy as np

from tempest_tpu import Sampler

A_TRUE, B_TRUE = 0.5, 2.0
OMEGA_TRUE = 2 * np.pi
PHI_TRUE = np.pi / 4
SIGMA_TRUE = 0.25

np.random.seed(42)
N_DATA = 50
x_np = np.linspace(0, 3, N_DATA)
y_np = (A_TRUE * x_np + B_TRUE) * np.sin(OMEGA_TRUE * x_np + PHI_TRUE)
y_np = y_np + np.random.normal(0, SIGMA_TRUE, size=N_DATA)

x_data = jnp.asarray(x_np)
y_data = jnp.asarray(y_np)


def log_likelihood(theta):
    A, B = theta[..., 0:1], theta[..., 1:2]
    omega, phi, sigma = theta[..., 2:3], theta[..., 3:4], theta[..., 4:5]
    y_pred = (A * x_data + B) * jnp.sin(omega * x_data + phi)
    resid = (y_data - y_pred) / sigma
    return -0.5 * jnp.sum(resid**2 + jnp.log(2 * jnp.pi * sigma**2), axis=-1)


def prior_transform(u):
    return jnp.stack(
        [
            u[..., 0],
            5.0 * u[..., 1],
            8.0 * jnp.pi * u[..., 2],
            2.0 * jnp.pi * u[..., 3],
            10.0 ** (3.0 * u[..., 4] - 2.0),
        ],
        axis=-1,
    )


def main():
    sampler = Sampler(
        prior_transform, log_likelihood, n_dim=5,
        n_particles=512, vectorize=True, random_state=42,
        history_capacity=64,
    )
    sampler.run(n_total=4096, progress=False)
    theta, w, _ = sampler.posterior()
    logz, _ = sampler.evidence()
    theta = np.asarray(theta)
    w = np.asarray(w, dtype=float)
    w = w / w.sum()
    print(f"logZ = {logz:.3f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # posterior predictive band from 256 weighted draws
    rng = np.random.default_rng(0)
    idx = rng.choice(len(w), size=256, p=w)
    xg = np.linspace(0, 3, 300)
    preds = np.stack(
        [
            (theta[i, 0] * xg + theta[i, 1])
            * np.sin(theta[i, 2] * xg + theta[i, 3])
            for i in idx
        ]
    )
    lo, mid, hi = np.percentile(preds, [2.5, 50.0, 97.5], axis=0)

    fig, ax = plt.subplots(figsize=(7.2, 4.6))
    ax.fill_between(xg, lo, hi, color="#93c5fd", alpha=0.6,
                    label="95% posterior predictive")
    ax.plot(xg, mid, color="#2563eb", lw=1.6, label="posterior median")
    ax.plot(
        xg, (A_TRUE * xg + B_TRUE) * np.sin(OMEGA_TRUE * xg + PHI_TRUE),
        color="#dc2626", lw=1.2, ls="--", label="true model",
    )
    ax.errorbar(x_np, y_np, yerr=SIGMA_TRUE, fmt="o", ms=3.5, lw=0.8,
                color="#111827", label="data", zorder=3)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_title(f"Oscillatory model fit (logZ = {float(logz):.2f})")
    ax.legend(loc="upper left", fontsize=9)
    savefig(fig, "oscillatory_fit.png")

    fig = pair_grid(
        theta, w,
        labels=["$A$", "$B$", r"$\omega$", r"$\phi$", r"$\sigma$"],
        truths=[A_TRUE, B_TRUE, OMEGA_TRUE, PHI_TRUE, SIGMA_TRUE],
    )
    savefig(fig, "oscillatory_corner.png")


if __name__ == "__main__":
    main()
