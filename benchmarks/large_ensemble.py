"""Single-chip large-ensemble capacity benchmark (VERDICT r2 item 2b).

Runs the canonical paired 10-D Rosenbrock (bench.py problem) with a very
large persistent ensemble on ONE TPU chip, clustering on, whole run fused
on-device. Round 2 capped out at N=65,536: the old (T, N, d) history layout
padded d=10 to 128 lanes, so buffers cost 12.8x their logical bytes and
N=2^20 OOMed at compile. The round-3 (d, T, N) layout puts the particle
axis on the 128-lane minor dimension (N is huge, padding negligible) and
the capacity-48 history at N=2^20 is ~4 GB logical ~= physical.

Writes benchmarks/results/large_ensemble_tpu.json.

Usage:
    python benchmarks/large_ensemble.py [--n 1048576] [--capacity 48]
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

import bench  # canonical problem definition (prior/likelihood)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 20)
    p.add_argument("--capacity", type=int, default=48)
    p.add_argument("--train-max-points", type=int, default=8192)
    p.add_argument("--json", default="benchmarks/results/large_ensemble_tpu.json")
    p.add_argument(
        "--hardware-prng", action="store_true",
        help="draw mutation randomness from the TPU hardware PRNG "
        "(config.hardware_prng; different, statistically equivalent RNG "
        "stream — measured 2.5x end-to-end at N=2^17, hw_prng_e2e.json)",
    )
    p.add_argument(
        "--whole-run-fused", dest="whole_run_fused", action="store_true",
        default=True,
        help="dispatch the entire annealing as ONE device program "
        "(default). Donated buffers keep a single live history copy; "
        "bit-exact vs the host loop (fused_run_validation.py). At "
        "multi-GiB state this is ~1.9x the host loop end-to-end: each "
        "host-loop dispatch pays seconds of relay value-shipping "
        "(1M hwprng steady state 372 s host loop vs 200 s fused).",
    )
    p.add_argument(
        "--host-loop", dest="whole_run_fused", action="store_false",
        help="per-iteration dispatch fallback (on_device=False); keeps "
        "per-iteration records for monitoring.",
    )
    args = p.parse_args()

    from tempest_tpu import Sampler
    from tempest_tpu.ops.tools import ess_from_logw
    from tempest_tpu.state import compute_logw_and_logz

    def build(seed):
        return Sampler(
            bench.prior_transform,
            bench.log_likelihood,
            n_dim=bench.N_DIM,
            n_particles=args.n,
            vectorize=True,
            clustering=True,
            random_state=seed,
            history_capacity=args.capacity,
            train_max_points=args.train_max_points,
            hardware_prng=args.hardware_prng,
        )

    report = {
        "description": (
            "Large-ensemble capacity demonstration on ONE TPU chip: the "
            "canonical paired 10-D Rosenbrock with an N-particle ensemble, "
            "clustering on, whole run fused on-device. The (d, T, N) history "
            "layout keeps physical bytes == logical bytes (round 2's "
            "(T, N, d) layout lane-padded d=10 to 128 and OOMed at N=2^20)."
        ),
        "config": {
            "problem": "10d_paired_rosenbrock",
            "n_particles": args.n,
            "n_total": args.n,
            "clustering": True,
            "history_capacity": args.capacity,
            "train_max_points": args.train_max_points,
            "hardware_prng": bool(args.hardware_prng),
            "device": jax.devices()[0].device_kind,
            "history_logical_gb": round(
                2 * bench.N_DIM * args.capacity * args.n * 4 / 2**30, 2
            ),
        },
    }

    def one_run(s, label, n_total):
        t0 = time.time()
        s.run(n_total=n_total, progress=False, on_device=args.whole_run_fused)
        _ = float(jnp.sum(s.state.cur.logl))  # genuine value fetch ends timing
        wall = time.time() - t0
        logw, _ = compute_logw_and_logz(s.state.hist, 1.0)
        ess = float(ess_from_logw(logw))
        logz, _ = s.evidence()
        rec = {
            "wall_s": round(wall, 1),
            "ess": round(ess, 1),
            "eff_samples_per_s": round(ess / wall, 1),
            "logz": round(float(logz), 4),
            "iters": int(s.state.hist.t),
            "calls": int(s.calls),
            "history_samples": int(s.state.hist.t) * args.n,
            "K": int(s.state.trainer.cluster_model.n_clusters()),
        }
        print(label, json.dumps(rec), flush=True)
        return rec

    # First run includes the (cold) compile of the fused whole-run program
    # at this shape; the reset run measures steady-state execution.
    s = build(seed=42)
    report["first_run_incl_compile"] = one_run(s, "first", args.n)
    s.reset(random_state=43)
    report["steady_state"] = dict(seed=43, **one_run(s, "steady", args.n))

    report["notes"] = [
        f"posterior ESS ~{report['steady_state']['ess']:,.0f} from one "
        f"{report['steady_state']['wall_s']}-second run on a single chip",
        "logZ approaches the reference-CPU 5-seed mean (-34.98 +/- 0.33, "
        "benchmarks/results/reference_cpu.json) as the MIS finite-N bias "
        "shrinks with ensemble size",
        "the (d, T, N) layout lifted the round-2 single-chip ceiling of "
        "N=65,536 (12.8x HBM tiling waste) to N=2^20 at capacity 48",
    ]
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
