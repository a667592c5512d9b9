"""Whole-run fused contract validation at the round-3 faulting size.

Round 3 measured the `run(on_device=True)` whole-run program CRASHING the
TPU worker at N=2^19, capacity 48 (~2 GB logical u+x history). Round-4
root-causing found TWO independent problems:

1. Without buffer donation the program preserved the caller's history
   (JAX input semantics) WHILE holding the while-loop carry. Round 4
   donates (hist, cur) into both fused programs; the compiler's own
   memory_analysis at this shape confirms full input/output aliasing
   (alias == args == 2.13 GiB, temps 3.8 GiB — one resident history).
2. The actual crash trigger was an EXECUTION-LENGTH WATCHDOG, not
   memory: the relayed worker kills any single execution at ~60 s wall
   (reproduced with a 16 KB-state spin kernel). Large histories crashed
   only because their whole-run dispatch ran for minutes. Round 4 chunks
   the device loop under `on_device_dispatch_budget_s` (45 s default),
   re-entering with donated buffers; chunk boundaries change no value.

This script is the acceptance gate: at the exact faulting configuration
it must (a) complete `on_device=True` on the real chip, and (b) match the
per-iteration host-loop path BIT-EXACTLY (the two paths consume identical
RNG streams by construction — core.execute_iteration mirrors the fused
split — so ladders, ensembles, and evidence must agree exactly).

Writes benchmarks/results/fused_run_validation.json.

Usage:
    python benchmarks/fused_run_validation.py [--n 524288] [--capacity 48]
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

import bench  # canonical problem definition (prior/likelihood)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 19)
    p.add_argument("--capacity", type=int, default=48)
    p.add_argument("--train-max-points", type=int, default=8192)
    p.add_argument("--json", default="benchmarks/results/fused_run_validation.json")
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
        )

    def one_run(label, on_device):
        s = build(seed=42)
        t0 = time.time()
        s.run(n_total=args.n, progress=False, on_device=on_device)
        _ = float(jnp.sum(s.state.cur.logl))  # genuine value fetch
        wall = time.time() - t0
        t = int(s.state.hist.t)
        logw, _ = compute_logw_and_logz(s.state.hist, 1.0)
        rec = {
            "wall_s": round(wall, 1),
            "iters": t,
            "beta_ladder": np.asarray(s.state.hist.beta)[:t].tolist(),
            "logz": float(s.logz),
            "ess": float(ess_from_logw(logw)),
            "logl_sum": float(jnp.sum(s.state.cur.logl)),
            "K": int(s.state.trainer.cluster_model.n_clusters()),
        }
        print(label, json.dumps({k: v for k, v in rec.items() if k != "beta_ladder"}),
              flush=True)
        return rec

    fused = one_run("on_device=True ", on_device=True)
    host = one_run("on_device=False", on_device=False)

    assert fused["iters"] == host["iters"], (
        f"iteration counts diverged: {fused['iters']} vs {host['iters']}"
    )
    assert fused["beta_ladder"] == host["beta_ladder"], "beta ladders diverged"
    assert fused["logz"] == host["logz"], (
        f"logZ diverged: {fused['logz']} vs {host['logz']}"
    )
    assert fused["logl_sum"] == host["logl_sum"], "final ensembles diverged"

    hist_gb = 2 * bench.N_DIM * args.capacity * args.n * 4 / 2**30
    report = {
        "description": (
            "Whole-run fused (on_device=True) at the round-3 worker-crash "
            "configuration, vs the per-iteration host loop. Donated "
            "(hist, cur) buffers keep ONE resident history copy through "
            "the run-level while_loop; the two paths are bit-exact."
        ),
        "config": {
            "problem": "10d_paired_rosenbrock",
            "n_particles": args.n,
            "history_capacity": args.capacity,
            "history_logical_gb": round(hist_gb, 2),
            "device": jax.devices()[0].device_kind,
        },
        "on_device_true": {k: v for k, v in fused.items() if k != "beta_ladder"},
        "host_loop": {k: v for k, v in host.items() if k != "beta_ladder"},
        "bit_exact": {
            "iteration_count": True,
            "beta_ladder": True,
            "logz": True,
            "final_ensemble_logl_sum": True,
        },
    }
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
