"""Figure: paired 10-D Rosenbrock posterior (docs/examples/rosenbrock.md).

Generates `rosenbrock_pairs.png` — the weighted pair grid of the first four
coordinates, showing the curved banana ridge in each (x_2k, x_2k+1) pair.
"""

from common import force_cpu, pair_grid, savefig

force_cpu()

import jax.numpy as jnp

from tempest_tpu import Sampler

N_DIM = 10


def prior_transform(u):
    return -10.0 + 20.0 * u


def log_likelihood(x):
    return -jnp.sum(
        100.0 * (x[..., 1::2] - x[..., ::2] ** 2) ** 2
        + (1.0 - x[..., ::2]) ** 2,
        axis=-1,
    )


def main():
    sampler = Sampler(
        prior_transform, log_likelihood, n_dim=N_DIM,
        n_particles=512, vectorize=True, random_state=42,
        history_capacity=64,
    )
    sampler.run(n_total=4096, progress=False)
    x, w, _ = sampler.posterior()
    logz, _ = sampler.evidence()
    print(f"logZ = {logz:.3f}")

    fig = pair_grid(
        x[:, :4], w,
        labels=[rf"$x_{{{i}}}$" for i in range(4)],
        truths=[1.0, 1.0, 1.0, 1.0],
    )
    fig.suptitle(
        f"Paired 10-D Rosenbrock — first two coordinate pairs "
        f"(logZ = {float(logz):.2f})",
        y=1.005,
    )
    savefig(fig, "rosenbrock_pairs.png")


if __name__ == "__main__":
    main()
