"""Reference-side CPU baseline for the canonical Rosenbrock benchmark.

Runs the ACTUAL reference implementation (/root/reference, minaskar/tempest,
pure NumPy/SciPy) on this machine's CPU with the canonical configuration from
/root/reference/docs/examples/rosenbrock.md:39-77 — paired 10-D Rosenbrock
log-likelihood, U(-10, 10) prior, n_particles=1024, n_total=8192,
vectorize=True, clustering left at its default (True,
/root/reference/tempest/sampler.py:37) — over several seeds, and writes the
throughput/accuracy baseline that `bench.py` compares against.

Usage:
    python benchmarks/reference_cpu.py [n_seeds] [out.json]

Output JSON: per-seed {wall_s, ess, eff_samples_per_s, logz, calls, iters}
plus aggregate mean/std. This is the committed, re-runnable source of the
`vs_baseline` denominator (VERDICT round 1, item 2).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/reference")

N_DIM = 10
N_PARTICLES = 1024
N_TOTAL = 8192


def prior_transform(u):
    return 20.0 * u - 10.0


def log_likelihood(x):
    # Paired Rosenbrock (docs/examples/rosenbrock.md:39-55)
    if x.ndim == 1:
        x = x.reshape(1, -1)
    result = -np.sum(
        100.0 * (x[:, 1::2] - x[:, ::2] ** 2) ** 2 + (1.0 - x[:, ::2]) ** 2,
        axis=1,
    )
    return result.squeeze() if result.size == 1 else result


def run_once(seed):
    import tempest as tp

    sampler = tp.Sampler(
        prior_transform=prior_transform,
        log_likelihood=log_likelihood,
        n_dim=N_DIM,
        n_particles=N_PARTICLES,
        vectorize=True,
        random_state=seed,
    )
    t0 = time.time()
    sampler.run(n_total=N_TOTAL, progress=False)
    wall = time.time() - t0

    # Posterior effective sample size of the full persistent history at
    # beta=1 — the same metric bench.py reports for the TPU build.
    state = sampler._core.state
    logw, logz = state.compute_logw_and_logz(1.0)
    w = np.exp(logw - np.max(logw))
    w /= w.sum()
    ess = 1.0 / np.sum(w**2)
    return {
        "seed": seed,
        "wall_s": round(wall, 2),
        "ess": round(float(ess), 1),
        "eff_samples_per_s": round(float(ess) / wall, 2),
        "logz": round(float(logz), 4),
        "calls": int(state.get_current("calls")),
        "iters": int(state.get_current("iter")),
    }


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = Path(
        sys.argv[2] if len(sys.argv) > 2 else
        Path(__file__).parent / "results" / "reference_cpu.json"
    )
    out_path.parent.mkdir(parents=True, exist_ok=True)

    runs = []
    for seed in range(42, 42 + n_seeds):
        r = run_once(seed)
        runs.append(r)
        print(json.dumps(r), flush=True)

    eff = np.array([r["eff_samples_per_s"] for r in runs])
    logz = np.array([r["logz"] for r in runs])
    summary = {
        "config": {
            "problem": "10d_paired_rosenbrock",
            "prior": "U(-10,10)^10",
            "n_particles": N_PARTICLES,
            "n_total": N_TOTAL,
            "clustering": True,
            "vectorize": True,
            "seeds": [r["seed"] for r in runs],
        },
        "runs": runs,
        "eff_samples_per_s_mean": round(float(eff.mean()), 2),
        "eff_samples_per_s_std": round(float(eff.std(ddof=1)) if len(runs) > 1 else 0.0, 2),
        "logz_mean": round(float(logz.mean()), 4),
        "logz_std": round(float(logz.std(ddof=1)) if len(runs) > 1 else 0.0, 4),
    }
    out_path.write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))


if __name__ == "__main__":
    main()
