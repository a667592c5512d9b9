"""Figure: model comparison (docs/examples/model_comparison.md).

Generates `model_comparison.png` — the synthetic data with the linear and
oscillatory posterior-predictive medians side by side, annotated with each
model's logZ and the resulting log10 Bayes factor.
"""

from common import force_cpu, savefig

force_cpu()

import jax.numpy as jnp
import numpy as np

from tempest_tpu import Sampler

np.random.seed(42)
x_np = np.linspace(0, 3, 50)
y_np = (0.5 * x_np + 2.0) * np.sin(2 * np.pi * x_np + np.pi / 4)
y_np += np.random.normal(0, 0.25, size=50)
x_data, y_data = jnp.asarray(x_np), jnp.asarray(y_np)


def _gauss_loglike(model, sigma):
    return jnp.sum(
        -0.5 * ((y_data - model) / sigma) ** 2
        - 0.5 * jnp.log(2 * jnp.pi * sigma**2),
        axis=-1,
    )


def loglike_lin(theta):
    a, b, sigma = theta[..., 0:1], theta[..., 1:2], theta[..., 2:3]
    return _gauss_loglike(a * x_data + b, sigma)


def loglike_osc(theta):
    A, B = theta[..., 0:1], theta[..., 1:2]
    omega, phi, sigma = theta[..., 2:3], theta[..., 3:4], theta[..., 4:5]
    return _gauss_loglike((A * x_data + B) * jnp.sin(omega * x_data + phi), sigma)


def prior_lin(u):
    return jnp.stack(
        [
            -5.0 + 10.0 * u[..., 0],            # a ~ U(-5, 5)
            -5.0 + 10.0 * u[..., 1],            # b ~ U(-5, 5)
            10.0 ** (3.0 * u[..., 2] - 2.0),    # sigma ~ LogU(0.01, 10)
        ],
        axis=-1,
    )


def prior_osc(u):
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


def run(prior, loglike, n_dim, seed):
    s = Sampler(
        prior, loglike, n_dim=n_dim, n_particles=512,
        vectorize=True, random_state=seed, history_capacity=64,
    )
    s.run(n_total=4096, progress=False)
    theta, w, _ = s.posterior()
    logz, _ = s.evidence()
    return np.asarray(theta), np.asarray(w, dtype=float), float(logz)


def predictive_median(theta, w, model_fn, xg):
    rng = np.random.default_rng(0)
    idx = rng.choice(len(w), size=256, p=w / w.sum())
    preds = np.stack([model_fn(theta[i], xg) for i in idx])
    return np.percentile(preds, [2.5, 50.0, 97.5], axis=0)


def main():
    th_l, w_l, logz_l = run(prior_lin, loglike_lin, 3, seed=7)
    th_o, w_o, logz_o = run(prior_osc, loglike_osc, 5, seed=42)
    log10_bf = (logz_o - logz_l) / np.log(10.0)
    print(f"linear logZ = {logz_l:.2f}, oscillatory logZ = {logz_o:.2f}, "
          f"log10 BF = {log10_bf:.2f}")

    xg = np.linspace(0, 3, 300)
    lo_l, med_l, hi_l = predictive_median(
        th_l, w_l, lambda t, x: t[0] * x + t[1], xg)
    lo_o, med_o, hi_o = predictive_median(
        th_o, w_o, lambda t, x: (t[0] * x + t[1]) * np.sin(t[2] * x + t[3]), xg)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11.5, 4.4), sharey=True)
    for ax, (lo, med, hi), logz, name, color in (
        (axes[0], (lo_l, med_l, hi_l), logz_l, "M1: linear", "#ea580c"),
        (axes[1], (lo_o, med_o, hi_o), logz_o, "M2: oscillatory", "#2563eb"),
    ):
        ax.fill_between(xg, lo, hi, color=color, alpha=0.2)
        ax.plot(xg, med, color=color, lw=1.8, label="posterior median")
        ax.plot(x_np, y_np, "o", ms=3.5, color="#111827", label="data")
        ax.set_title(f"{name}   (logZ = {logz:.2f})")
        ax.set_xlabel("x")
        ax.legend(fontsize=9)
    axes[0].set_ylabel("y")
    fig.suptitle(
        rf"Bayesian model comparison: $\log_{{10}}\mathrm{{BF}}_{{21}}$ = "
        f"{log10_bf:.2f} — decisive for the oscillatory model",
        y=1.02,
    )
    savefig(fig, "model_comparison.png")


if __name__ == "__main__":
    main()
