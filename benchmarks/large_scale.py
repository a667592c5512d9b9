"""BASELINE config #5: 100-D Rosenbrock at 1M persistent particles, sharded.

Two modes:

- `--cpu` (default here; what CI / this container can run): the 8-virtual-
  device CPU mesh executes the REAL sharded program — warm-up plus several
  full fused PS iterations at the spec size (N=2^20 particles, d=100) —
  with correctness asserts (ladder progressing, finite likelihoods,
  particle-axis sharding preserved end-to-end, per-device history bytes =
  1/n_devices of the global buffer). A full annealing at this size is a
  TPU-pod job (~100 iterations x ~1 TFLOP-scale sweeps); the CPU run
  validates the complete multi-chip execution path at spec scale, which no
  smaller test can.
- on real TPU hardware the same script runs the identical program on the
  chips available (single chip: pass --devices 1 and a feasible N).

Writes benchmarks/results/config5_sharded_cpu.json.

Usage:
    python benchmarks/large_scale.py --cpu [--n 1048576] [--d 100] [--iters 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CPU = "--cpu" in sys.argv
if _CPU:
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if _CPU:
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def rosenbrock(x):
    return -jnp.sum(
        100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (1.0 - x[..., :-1]) ** 2,
        axis=-1,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--n", type=int, default=1 << 20)
    p.add_argument("--d", type=int, default=100)
    p.add_argument("--iters", type=int, default=5, help="PS iterations incl. warm-ups")
    p.add_argument(
        "--n-max-steps", type=int, default=2,
        help="cap on adaptive MCMC sweeps (x n_dim); bounds the CPU "
        "correctness run's wall clock — on TPU hardware leave at default 20",
    )
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--capacity", type=int, default=8)
    p.add_argument("--json", default="benchmarks/results/config5_sharded_cpu.json")
    args = p.parse_args()

    from tempest_tpu import Sampler
    from tempest_tpu.parallel.mesh import make_particle_mesh

    mesh = make_particle_mesh(args.devices) if args.devices > 1 else None
    n_dev = args.devices

    s = Sampler(
        lambda u: -10.0 + 20.0 * u,
        rosenbrock,
        n_dim=args.d,
        n_particles=args.n,
        vectorize=True,
        clustering=False,  # Rosenbrock is a single curved mode
        random_state=5,
        history_capacity=args.capacity,
        mesh=mesh,
        # one proposal candidate: an out-of-bounds draw is rejected via
        # alpha=0 instead of redrawn — identical stationary distribution,
        # 1/8th the proposal FLOPs (documented deviation, mcmc.py header)
        n_candidates=1,
        n_max_steps=args.n_max_steps,
    )

    report = {
        "config": {
            "problem": f"{args.d}-D Rosenbrock, U(-10,10) prior",
            "n_particles": args.n,
            "n_dim": args.d,
            "n_devices": n_dev,
            "history_capacity": args.capacity,
            "backend": jax.default_backend(),
            "physical_cores": os.cpu_count() if _CPU else None,
        },
        "iterations": [],
    }

    logical_bytes = 2 * args.d * args.capacity * args.n * 4  # u + x, f32
    report["config"]["history_logical_gb"] = round(logical_bytes / 2**30, 2)

    for it in range(args.iters):
        t0 = time.time()
        st = s.sample()
        wall = time.time() - t0
        rec = {
            "iter": st["iter"],
            "beta": st["beta"],
            "logz": st["logz"],
            "ess": st["ess"],
            "calls": st["calls"],
            "steps": st["steps"],
            "acceptance": st["acceptance"],
            "wall_s": round(wall, 1),
        }
        # -- correctness asserts (the point of the run) -------------------
        assert np.isfinite(st["logz"]), "non-finite logZ"
        logl = s.state.cur.logl
        assert bool(jnp.all(jnp.isfinite(logl))), "non-finite logl in active set"
        # beta legitimately stays at 0 while the persistent history holds
        # <= ess_ratio * N samples: the first ceil(ess_ratio) iterations
        # draw fresh prior batches, and at exactly t = ess_ratio ESS(0)
        # equals the target so the stay-at-beta rule (reference
        # reweight.py) keeps beta = 0 one extra round.
        if it >= 3:
            assert st["beta"] > 0.0, "ladder not progressing"
        hist_u = s.state.hist.u
        if mesh is not None:
            assert not hist_u.sharding.is_fully_replicated, "history replicated!"
            shard = hist_u.addressable_shards[0]
            frac = np.prod(shard.data.shape) / np.prod(hist_u.shape)
            assert abs(frac - 1.0 / n_dev) < 1e-9, (
                f"device holds {frac:.3f} of the history, expected {1/n_dev:.3f}"
            )
            rec["per_device_fraction"] = frac
        report["iterations"].append(rec)
        print(json.dumps(rec), flush=True)

    betas = [r["beta"] for r in report["iterations"]]
    assert betas == sorted(betas), "beta ladder must be monotone"
    report["asserts"] = [
        "finite logZ and active-set log-likelihoods every iteration",
        "beta ladder monotone and progressing after warm-up",
        f"history sharded: each device holds exactly 1/{n_dev} of (d, T, N) buffers",
    ]
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
