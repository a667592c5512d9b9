"""Benchmark: effective samples/s on the CANONICAL 10-D Rosenbrock problem.

Configuration matches the reference's canonical example exactly
(/root/reference/docs/examples/rosenbrock.md:19-77): PAIRED 10-D Rosenbrock
log-likelihood, uniform U(-10, 10) prior, n_particles=1024, n_total=8192,
vectorized likelihood, and the reference DEFAULTS — clustering=True
(/root/reference/tempest/sampler.py:37), tpcn mutation, multinomial
resampling.

Metric: posterior effective sample size (MIS weights over the full
persistent history at beta=1) divided by steady-state wall-clock of the
full run. A short same-shape run first populates the in-process compile
cache so the measurement reflects execution, not XLA compilation (the
NumPy reference has no compile step).

Baseline (vs_baseline denominator): the reference implementation measured
on this machine's CPU with the identical configuration by the committed
script benchmarks/reference_cpu.py over 5 seeds:
26.12 +/- 1.94 effective samples/s, logZ -34.98 +/- 0.33
(benchmarks/results/reference_cpu.json; re-runnable).

The run also cross-checks the Pallas VMEM bisection kernel against the
XLA-path bisection on the real annealing history (round-1 review: the
kernel had no on-TPU numeric test).

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

N_DIM = 10
N_PARTICLES = 1024
N_TOTAL = 8192
HISTORY_CAPACITY = 64


def _load_reference_baseline():
    """eff-samples/s denominator from the committed reference measurement."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "results", "reference_cpu.json",
    )
    try:
        with open(path) as f:
            return float(json.load(f)["eff_samples_per_s_mean"])
    except (OSError, KeyError, ValueError):
        return 26.12  # benchmarks/results/reference_cpu.json, 5 seeds


def prior_transform(u):
    return 20.0 * u - 10.0


def log_likelihood(x):
    # Paired Rosenbrock (reference docs/examples/rosenbrock.md:39-55)
    return -jnp.sum(
        100.0 * (x[..., 1::2] - x[..., ::2] ** 2) ** 2
        + (1.0 - x[..., ::2]) ** 2,
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
        random_state=seed,
        history_capacity=HISTORY_CAPACITY,
    )


def posterior_ess(sampler):
    from tempest_tpu.ops.tools import ess_from_logw
    from tempest_tpu.state import compute_logw_and_logz

    logw, _ = compute_logw_and_logz(sampler.state.hist, 1.0)
    return float(ess_from_logw(logw))


def check_pallas_vs_xla(hist):
    """Pallas VMEM bisection == XLA-path bisection on the real history.

    Runs only where the kernel is actually used (TPU backend, float32,
    VMEM-sized history). Uses a mid-ladder beta_prev so the bisection has
    genuine work to do.
    """
    from tempest_tpu.ops.pallas_reweight import ess_bisect_beta, pallas_supported
    from tempest_tpu.state import mis_denominator
    from tempest_tpu.steps.reweight import _find_beta_bisection, _make_metric_fns

    if not pallas_supported(hist.logl.size, hist.logl.dtype):
        print("# pallas check skipped (unsupported backend/size)", file=sys.stderr)
        return

    t = int(hist.t)
    beta_prev = jnp.asarray(float(hist.beta[max(t // 2, 0)]), hist.logl.dtype)

    denom = mis_denominator(hist)
    bm = jnp.where(hist.sample_mask(), denom, jnp.inf)
    ess_at, metric_at = _make_metric_fns(hist, False, denom)
    one = jnp.asarray(1.0, hist.logl.dtype)
    ess_cur = float(ess_at(beta_prev))
    ess_one = float(ess_at(one))
    # Target strictly between ESS(beta_prev) and ESS(1) so BOTH paths must
    # genuinely bisect (at the end of a converged run ESS(1) usually
    # exceeds 2N, which would short-circuit to the jump-to-1 branch and
    # test nothing).
    target = jnp.asarray(float(np.sqrt(ess_cur * ess_one)), hist.logl.dtype)

    beta_pallas = float(ess_bisect_beta(hist.flat_logl(), bm, beta_prev, target))

    if ess_cur <= float(target):
        beta_xla = float(beta_prev)
    elif ess_one >= float(target):
        beta_xla = 1.0
    else:
        beta_xla = float(
            _find_beta_bisection(metric_at, beta_prev, one, target, dynamic=False)
        )

    err = abs(beta_pallas - beta_xla)
    assert err < 5e-3, f"pallas beta {beta_pallas} vs xla {beta_xla} (err {err})"
    print(
        f"# pallas-vs-xla beta check OK: {beta_pallas:.6f} vs {beta_xla:.6f}",
        file=sys.stderr,
    )


SEEDS = (42, 43, 44)


def main():
    # Compile everything with a short same-shape run, then reset state and
    # time the real runs: steady-state throughput (the NumPy reference has
    # no compilation step to amortize). Multiple seeds: the adaptive ladder
    # and cluster-count trajectory are seed-dependent (per-seed wall clock
    # varies ~±25%, benchmarks/results/flagship_tpu.json), so a single run
    # under- or over-states what the framework sustains; the reported value
    # is the mean per-seed eff/s over SEEDS, matching the flagship
    # artifact's methodology.
    s = build_sampler(seed=7)
    s.run(n_total=512, progress=False, on_device=True)

    values, per_seed = [], []
    for seed in SEEDS:
        s.reset(random_state=seed)
        t0 = time.time()
        s.run(n_total=N_TOTAL, progress=False, on_device=True)
        # End the timed region at a genuine VALUE fetch: on relayed
        # backends block_until_ready can return before execution finishes,
        # so blocking alone understates the wall clock.
        _ = float(jnp.sum(s.state.cur.logl))
        wall = time.time() - t0

        ess = posterior_ess(s)
        logz, _ = s.evidence()
        values.append(ess / wall)
        per_seed.append(
            f"seed {seed}: wall={wall:.2f}s ess={ess:.1f} logz={logz:.3f} "
            f"calls={s.calls} iters={int(s.state.hist.t)} "
            f"K={int(s.state.trainer.cluster_model.n_clusters())} "
            f"eff/s={ess / wall:.0f}"
        )

    for line in per_seed:
        print(f"# {line}", file=sys.stderr)
    value = float(np.mean(values))
    check_pallas_vs_xla(s.state.hist)

    baseline = _load_reference_baseline()
    print(
        json.dumps(
            {
                "metric": "effective_samples_per_s_10d_rosenbrock",
                "value": round(value, 2),
                "unit": "eff_samples/s/chip",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
