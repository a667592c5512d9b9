"""Figure: bimodal Gaussian mixture (docs/examples/gaussian_mixture.md).

Generates `gaussian_mixture.png` — posterior samples colored by the
hierarchical clusterer's mode assignment, with the true mode centers
marked, plus the per-mode weight split.
"""

from common import force_cpu, savefig

force_cpu()

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
    a = -0.5 * jnp.sum((x - SEP) ** 2, axis=-1) / SIGMA**2
    b = -0.5 * jnp.sum((x + SEP) ** 2, axis=-1) / SIGMA**2
    return jnp.logaddexp(a, b) - jnp.log(2.0) + norm


def main():
    sampler = Sampler(
        prior_transform, log_likelihood, n_dim=N_DIM,
        n_particles=512, vectorize=True, clustering=True, random_state=1,
        history_capacity=64,
    )
    sampler.run(n_total=4096, progress=False)
    x, w, _ = sampler.posterior()
    x = np.asarray(x)
    w = np.asarray(w)
    w = w / w.sum()
    logz, _ = sampler.evidence()
    frac_pos = w[x[:, 0] > 0].sum()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mode = (x[:, 0] > 0).astype(int)
    colors = np.array(["#2563eb", "#ea580c"])
    fig, ax = plt.subplots(figsize=(6.4, 5.6))
    # point area proportional to importance weight so trimmed-tail samples fade
    area = 1800.0 * w
    ax.scatter(
        x[:, 0], x[:, 1], s=area, c=colors[mode], alpha=0.35, lw=0,
        rasterized=True,
    )
    for cx in (-SEP, SEP):
        ax.plot(cx, cx, marker="x", ms=12, mew=2.5, color="#111827")
    ax.set_xlabel("$x_0$")
    ax.set_ylabel("$x_1$")
    ax.set_title(
        f"Bimodal Gaussian mixture — mode split {frac_pos:.3f} / "
        f"{1 - frac_pos:.3f}, logZ = {float(logz):.2f} "
        f"(analytic {-N_DIM * np.log(20.0):.2f})"
    )
    ax.set_aspect("equal")
    savefig(fig, "gaussian_mixture.png")


if __name__ == "__main__":
    main()
