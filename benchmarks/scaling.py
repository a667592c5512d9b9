"""Weak-scaling measurement over a device mesh.

Runs the 10-D Rosenbrock config with a FIXED per-device particle count at
mesh sizes 1, 2, 4, ... and reports effective samples/s and the weak-
scaling efficiency relative to 1 device. On a real pod this measures
ICI-collective overheads; on the CPU 8-virtual-device backend it validates
the sharded program (numbers are not hardware-representative):

    python benchmarks/scaling.py --cpu --per-device 128

(--cpu forces an 8-virtual-device CPU backend from inside the script;
plain env vars do not survive this machine's sitecustomize override.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --cpu must act BEFORE jax initializes: sitecustomize on this machine
# overrides the JAX_PLATFORMS env var, so the only reliable route is
# XLA_FLAGS in os.environ plus jax.config (same trick as tests/conftest.py).
_CPU = "--cpu" in sys.argv
_N_VIRTUAL = 8
if _CPU:
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_N_VIRTUAL}"
    ).strip()

import jax

if _CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def rosenbrock(x):
    return -jnp.sum(
        100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (1.0 - x[..., :-1]) ** 2,
        axis=-1,
    )


def run_at(n_devices, per_device, n_total_per_device, seed=42):
    from tempest_tpu import Sampler
    from tempest_tpu.ops.tools import ess_from_logw
    from tempest_tpu.parallel.mesh import make_particle_mesh
    from tempest_tpu.state import compute_logw_and_logz

    mesh = make_particle_mesh(n_devices) if n_devices > 1 else None
    n_particles = per_device * n_devices

    def build(s):
        return Sampler(
            lambda u: -10.0 + 20.0 * u,
            rosenbrock,
            n_dim=10,
            n_particles=n_particles,
            vectorize=True,
            clustering=False,
            random_state=s,
            history_capacity=128,
            mesh=mesh,
        )

    s = build(seed + 1)
    s.run(n_total=n_particles, progress=False, on_device=True)
    s.reset(random_state=seed)

    t0 = time.time()
    s.run(n_total=n_total_per_device * n_devices, progress=False, on_device=True)
    _ = float(jnp.sum(s.state.cur.logl))  # genuine value fetch, not just block
    wall = time.time() - t0

    logw, _ = compute_logw_and_logz(s.state.hist, 1.0)
    ess = float(ess_from_logw(logw))
    return {
        "n_devices": n_devices,
        "n_particles": n_particles,
        "wall_s": round(wall, 2),
        "ess": round(ess, 1),
        "eff_samples_per_s": round(ess / wall, 2),
        "logz": round(s.logz, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per-device", type=int, default=512)
    p.add_argument("--n-total-per-device", type=int, default=2048)
    p.add_argument(
        "--cpu",
        action="store_true",
        help=f"force a {_N_VIRTUAL}-virtual-device CPU backend (validates the "
        "sharded program when only one real chip is attached)",
    )
    args = p.parse_args()

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base = None
    for n in sizes:
        r = run_at(n, args.per_device, args.n_total_per_device)
        if base is None:
            base = r["eff_samples_per_s"]
        r["weak_scaling_efficiency"] = round(r["eff_samples_per_s"] / (base * n), 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
