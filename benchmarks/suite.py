"""Benchmark suite over the BASELINE.json problem configs.

Each config reports effective posterior samples per second and the logZ
error versus the analytic value (where one exists). Run a single config:

    python benchmarks/suite.py rosenbrock10
    python benchmarks/suite.py all

Configs (BASELINE.json "configs"):
  rosenbrock10  10-D Rosenbrock, U(-10,10), vectorized (README example)
  gauss50       50-D correlated Gaussian (analytic logZ)
  mixture10     2-mode 10-D Gaussian mixture (clustering path)
  funnel25      25-D Neal's funnel (heavy-tail / step-size stress)
  rosenbrock100 100-D Rosenbrock (large-d stress; reduced n_total)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _rosenbrock(x):
    return -jnp.sum(
        100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (1.0 - x[..., :-1]) ** 2,
        axis=-1,
    )


def _make_gauss50():
    d = 50
    rng = np.random.default_rng(0)
    A = rng.normal(size=(d, d)) / np.sqrt(d)
    cov = A @ A.T + np.eye(d)
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    sign, logdet = np.linalg.slogdet(cov)
    norm = -0.5 * (d * np.log(2 * np.pi) + logdet)

    def loglike(x):
        return -0.5 * jnp.einsum("...i,ij,...j->...", x, prec, x) + norm

    # prior U(-10,10)^50; likelihood normalized => logZ = -50*log(20)
    return loglike, -d * np.log(20.0)


CONFIGS = {}


def config(name):
    def deco(fn):
        CONFIGS[name] = fn
        return fn

    return deco


@config("rosenbrock10")
def rosenbrock10():
    return dict(
        n_dim=10,
        prior=lambda u: -10.0 + 20.0 * u,
        loglike=_rosenbrock,
        vectorize=True,
        clustering=False,
        on_device=True,
        n_particles=1024,
        n_total=8192,
        history_capacity=128,
        analytic_logz=None,
    )


@config("gauss50")
def gauss50():
    loglike, lz = _make_gauss50()
    return dict(
        n_dim=50,
        prior=lambda u: -10.0 + 20.0 * u,
        loglike=loglike,
        vectorize=True,
        clustering=False,
        on_device=True,
        n_particles=1024,
        n_total=8192,
        history_capacity=128,
        analytic_logz=lz,
    )


@config("mixture10")
def mixture10():
    d, sep, sigma = 10, 3.0, 0.5

    def loglike(x):
        norm = -0.5 * d * jnp.log(2 * jnp.pi * sigma**2)
        a = -0.5 * jnp.sum((x - sep) ** 2, axis=-1) / sigma**2
        b = -0.5 * jnp.sum((x + sep) ** 2, axis=-1) / sigma**2
        return jnp.logaddexp(a, b) - jnp.log(2.0) + norm

    return dict(
        n_dim=d,
        prior=lambda u: -10.0 + 20.0 * u,
        loglike=loglike,
        vectorize=True,
        clustering=True,
        on_device=True,  # fused path carries the cluster model since r2
        n_particles=1024,
        n_total=4096,
        history_capacity=128,
        analytic_logz=-d * np.log(20.0),
        check_modes=True,
    )


@config("rosenbrock10_cv")
def rosenbrock10_cv():
    """Dynamic (volume-variation) ladder mode on the canonical problem.

    Exercises the CV-targeted bisection (steps/reweight.py dynamic branch,
    excluded from the Pallas bisection by design): every probe evaluates
    volume_variation_dtn over the full masked history, so this config is
    the performance bar for dynamic mode (VERDICT r3 weak #5: correctness
    was tested, cost was unmeasured).
    """
    return dict(
        n_dim=10,
        prior=lambda u: -10.0 + 20.0 * u,
        loglike=_rosenbrock,
        vectorize=True,
        clustering=False,
        on_device=True,
        n_particles=1024,
        n_total=8192,
        history_capacity=192,
        analytic_logz=None,
        volume_variation=1.0,
    )


@config("funnel25")
def funnel25():
    d = 25

    def loglike(x):
        v = x[..., 0]
        rest = x[..., 1:]
        logp_v = -0.5 * v**2 / 9.0 - 0.5 * jnp.log(2 * jnp.pi * 9.0)
        logp_r = jnp.sum(
            -0.5 * rest**2 / jnp.exp(v)[..., None]
            - 0.5 * (v[..., None] + jnp.log(2 * jnp.pi)),
            axis=-1,
        )
        return logp_v + logp_r

    return dict(
        n_dim=d,
        prior=lambda u: -20.0 + 40.0 * u,
        loglike=loglike,
        vectorize=True,
        clustering=False,
        on_device=True,
        n_particles=1024,
        n_total=4096,
        history_capacity=192,
        analytic_logz=-d * np.log(40.0),
    )


@config("rosenbrock100")
def rosenbrock100():
    return dict(
        n_dim=100,
        prior=lambda u: -10.0 + 20.0 * u,
        loglike=_rosenbrock,
        vectorize=True,
        clustering=False,
        on_device=True,
        n_particles=2048,
        n_total=4096,
        history_capacity=256,
        analytic_logz=None,
    )


def run_config(name, seed=42, timing_reps=3):
    """Run one config: accuracy fields from the canonical `seed` run,
    eff/s as the MEDIAN over `timing_reps` distinct-seed runs.

    Two measured hazards force the multi-seed median
    (benchmarks/results/regression_investigation_r5.json):
      * the axon relay MEMOIZES identical-input executions, so re-invoking
        an already-seen (seed, config) pair measures the relay cache, not
        the device;
      * relay dispatch jitter is ~+/-0.1 s, which dominates the sub-second
        configs (a single draw swung mixture10's reported eff/s 2x between
        rounds with an identical trajectory).
    Each timing rep uses its own derived seed (distinct inputs -> no
    memoization within or across invocations of different rounds), and the
    median suppresses single-draw jitter.
    """
    from tempest_tpu import Sampler
    from tempest_tpu.ops.tools import ess_from_logw
    from tempest_tpu.state import compute_logw_and_logz

    cfg = CONFIGS[name]()

    def build(s):
        return Sampler(
            cfg["prior"],
            cfg["loglike"],
            n_dim=cfg["n_dim"],
            n_particles=cfg["n_particles"],
            vectorize=cfg["vectorize"],
            clustering=cfg["clustering"],
            random_state=s,
            history_capacity=cfg["history_capacity"],
            volume_variation=cfg.get("volume_variation"),
        )

    # warm-up/compile run with the same shapes, then the timed runs
    s = build(seed + 1)
    s.run(n_total=max(512, cfg["n_particles"]), progress=False, on_device=cfg["on_device"])

    eff_runs = []
    canonical = None
    for rep in range(timing_reps):
        # rep 0 is the canonical seed (accuracy fields); later reps use
        # well-separated derived seeds for independent timing draws.
        rep_seed = seed if rep == 0 else seed + 7919 * rep
        s.reset(random_state=rep_seed)
        t0 = time.time()
        s.run(n_total=cfg["n_total"], progress=False, on_device=cfg["on_device"])
        _ = float(jnp.sum(s.state.cur.logl))  # genuine value fetch, not just block
        wall = time.time() - t0

        logw, _ = compute_logw_and_logz(s.state.hist, 1.0)
        ess = float(ess_from_logw(logw))
        eff_runs.append({"seed": rep_seed, "wall_s": round(wall, 3),
                         "ess": round(ess, 1),
                         "eff_per_s": round(ess / wall, 2)})
        if rep == 0:
            logz, _ = s.evidence()
            canonical = {
                "ess": round(ess, 1),
                "logz": round(float(logz), 3),
                "iterations": int(s.state.hist.t),
                "calls": int(s.calls),
            }
            if cfg.get("check_modes"):
                # Multimodal recovery on the canonical run: clusters found
                # + posterior mass per mode (s mutates on later reps).
                x, w, _ = s.posterior()
                canonical["n_modes_found"] = int(
                    s.state.trainer.cluster_model.n_clusters()
                )
                canonical["mode_mass_split"] = round(
                    float(np.sum(w[x[:, 0] > 0])), 3
                )

    med = sorted(r["eff_per_s"] for r in eff_runs)[len(eff_runs) // 2]
    out = {
        "config": name,
        "eff_samples_per_s": med,
        "wall_s": sorted(r["wall_s"] for r in eff_runs)[len(eff_runs) // 2],
        "ess": canonical["ess"],
        "logz": canonical["logz"],
        "iterations": canonical["iterations"],
        "calls": canonical["calls"],
        "timing_runs": [{k: v for k, v in r.items()} for r in eff_runs],
    }
    if cfg["analytic_logz"] is not None:
        out["logz_analytic"] = round(cfg["analytic_logz"], 3)
        out["logz_err"] = round(canonical["logz"] - cfg["analytic_logz"], 3)
    if cfg.get("check_modes"):
        out["n_modes_found"] = canonical["n_modes_found"]
        out["mode_mass_split"] = canonical["mode_mass_split"]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", choices=sorted(CONFIGS) + ["all"])
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    names = sorted(CONFIGS) if args.config == "all" else [args.config]
    results = []
    for name in names:
        try:
            out = run_config(name, seed=args.seed)
            results.append(out)
            print(json.dumps(out))
        except Exception as e:  # keep the suite going
            results.append({"config": name, "error": str(e)})
            print(json.dumps({"config": name, "error": str(e)}), file=sys.stderr)

    if args.config == "all":
        import jax as _jax

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "suite_tpu.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {"device": str(_jax.devices()[0]), "seed": args.seed,
                 "results": results},
                f, indent=2,
            )
            f.write("\n")


if __name__ == "__main__":
    main()
