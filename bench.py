"""Benchmark: effective samples/s on the canonical 10-D Rosenbrock problem.

Configuration matches the reference's README benchmark
(/root/reference/README.md:42-71): 10-D Rosenbrock log-likelihood, uniform
U(-10, 10) prior, n_particles=1024, n_total=8192, vectorized likelihood,
tpcn mutation, multinomial resampling, clustering off (unimodal target).

Metric: posterior effective sample size (MIS weights over the full
persistent history at beta=1) divided by steady-state wall-clock of the
full run. A short same-shape run first populates the in-process compile
cache so the measurement reflects execution, not XLA compilation (the
NumPy reference has no compile step).

Baseline (vs_baseline denominator): the reference implementation measured
on this machine's CPU with the identical configuration and random seed:
94.9 effective samples/s (wall 89.4 s, 56 iterations, 738k likelihood
calls, logZ = -51.43).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax

# Persistent XLA compilation cache: the fused whole-run program is a large
# compile (minutes on the remote TPU compile service); cached binaries make
# repeat bench runs start in seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REFERENCE_ESS_PER_S = 94.9  # reference CPU throughput, same config/seed
N_DIM = 10
N_PARTICLES = 1024
N_TOTAL = 8192
HISTORY_CAPACITY = 128


def prior_transform(u):
    return -10.0 + 20.0 * u


def log_likelihood(x):
    return -jnp.sum(
        100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (1.0 - x[..., :-1]) ** 2,
        axis=-1,
    )


def build_sampler(seed):
    from tempest_tpu import Sampler

    return Sampler(
        prior_transform,
        log_likelihood,
        n_dim=N_DIM,
        n_particles=N_PARTICLES,
        vectorize=True,
        clustering=False,
        random_state=seed,
        history_capacity=HISTORY_CAPACITY,
    )


def posterior_ess(sampler):
    from tempest_tpu.ops.tools import ess_from_logw
    from tempest_tpu.state import compute_logw_and_logz

    logw, _ = compute_logw_and_logz(sampler.state.hist, 1.0)
    return float(ess_from_logw(logw))


def main():
    # Compile everything with a short same-shape run, then reset state and
    # time the real run: steady-state throughput (the NumPy reference has
    # no compilation step to amortize).
    s = build_sampler(seed=7)
    s.run(n_total=512, progress=False, on_device=True)
    s.reset(random_state=42)

    t0 = time.time()
    s.run(n_total=N_TOTAL, progress=False, on_device=True)
    # End the timed region at a genuine VALUE fetch: on relayed backends
    # block_until_ready can return before execution finishes, so blocking
    # alone understates the wall clock.
    _ = float(jnp.sum(s.state.cur.logl))
    wall = time.time() - t0

    ess = posterior_ess(s)
    logz, _ = s.evidence()
    value = ess / wall

    print(
        f"# wall={wall:.2f}s ess={ess:.1f} logz={logz:.3f} "
        f"calls={s.calls} iters={int(s.state.hist.t)}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "effective_samples_per_s_10d_rosenbrock",
                "value": round(value, 2),
                "unit": "eff_samples/s/chip",
                "vs_baseline": round(value / REFERENCE_ESS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
