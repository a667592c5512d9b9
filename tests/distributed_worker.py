"""Worker process for the 2-process jax.distributed test.

Spawned by tests/test_distributed.py: joins a 2-process CPU "cluster"
(4 virtual devices each, 8 global), runs a clustered sharded annealing to
beta=1 through the public API, checkpoints, resumes, and prints one JSON
line for the parent to assert on.

Usage: distributed_worker.py <process_id> <coordinator_port> <workdir> [mode]

Modes (round-5 multi-controller hardening, VERDICT r4 item 7):
  full      (default) run to completion + end-state checkpoint asserts
  interrupt manual sample() loop; after 6 iterations save a sharded
            checkpoint, drop a flag file for the parent, and KEEP
            SAMPLING until the parent SIGKILLs this process mid-run
  resume    fresh processes (new coordinator) resume from the interrupt
            checkpoint and run to completion; the parent asserts the
            result matches the uninterrupted run exactly
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tempest_tpu import Sampler
from tempest_tpu.parallel.distributed import global_mesh, initialize, is_primary

N_DIM = 4
ANALYTIC_LOGZ = -N_DIM * float(np.log(20.0))


def prior_transform(u):
    return 20.0 * u - 10.0


def log_likelihood(x):
    return -0.5 * jnp.sum(x * x, axis=-1) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)


def _result_line(pid, s, mean0):
    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "beta": float(s.beta),
                "logz": round(float(s.logz), 10),
                "t": int(s.state.hist.t),
                "mean0": mean0,
            }
        ),
        flush=True,
    )


def main():
    process_id = int(sys.argv[1])
    port = int(sys.argv[2])
    workdir = Path(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "full"

    initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert is_primary() == (process_id == 0)

    mesh = global_mesh()

    def build(seed):
        # history_capacity is pinned so fresh, interrupted and resumed
        # runs all trace IDENTICAL buffer shapes: auto pre-growth would
        # give the resumed run a different padded history extent, and the
        # resulting reduction-order float noise breaks the test's
        # bit-exact logz assertion.
        return Sampler(
            prior_transform,
            log_likelihood,
            n_dim=N_DIM,
            n_particles=256,
            vectorize=True,
            clustering=True,
            random_state=seed,
            mesh=mesh,
            history_capacity=64,
        )

    if mode == "interrupt":
        # Manual stepping so the run is genuinely IN FLIGHT when the parent
        # kills us: save a sharded checkpoint at iteration 6, signal via a
        # flag file, then keep executing iterations until SIGKILL.
        s = build(7)
        ckpt = workdir / "mid.state"
        for i in range(100):
            s.sample()
            if int(s.state.hist.t) == 6:
                s.save_state(ckpt)
                (workdir / f"saved_{process_id}.flag").touch()
        return  # only reached if the parent never kills us

    if mode == "resume":
        # Different seed on purpose: every piece of run state (including
        # the RNG chain) must come from the checkpoint, not the ctor.
        s = build(123)
        s.run(n_total=512, progress=False, resume_state_path=workdir / "mid.state")
        x, w, _ = s.posterior()
        mean0 = float(np.average(x[:, 0], weights=w))
        _result_line(process_id, s, mean0)
        return

    s = build(7)
    s.run(n_total=512, progress=False)
    logz = s.logz

    # Multi-host checkpoint: per-host sharded (no global gather) — each
    # process writes only its addressable half of every particle-sharded
    # leaf (utils/checkpoint.save_checkpoint_sharded).
    ckpt = workdir / "mp.state"
    s.save_state(ckpt)
    assert ckpt.is_dir(), "multi-process save must use the sharded format"
    my_shard = ckpt / f"shard_{process_id}"
    assert my_shard.is_dir()
    # Size assertion: no process materialized the world. This process's
    # slab of hist.u holds exactly its half of the global buffer.
    hist_u = np.load(my_shard / "hist.u.npy", mmap_mode="r")
    g = s.state.hist.u.shape
    assert hist_u.shape == (g[0], g[1], g[2] // 2), (
        f"shard holds {hist_u.shape}, expected half of {g}"
    )

    # Resume into a fresh sampler; state must re-shard over the global mesh.
    s2 = Sampler(
        prior_transform,
        log_likelihood,
        n_dim=N_DIM,
        n_particles=256,
        vectorize=True,
        clustering=True,
        random_state=0,
        mesh=mesh,
    )
    s2.load_state(ckpt)
    assert int(s2.state.hist.t) == int(s.state.hist.t)
    assert abs(s2.logz - logz) < 1e-6
    assert not s2.state.hist.u.sharding.is_fully_addressable

    # Posterior extraction gathers shards across processes.
    x, w, _ = s2.posterior()
    mean0 = float(np.average(x[:, 0], weights=w))

    print(
        "RESULT "
        + json.dumps(
            {
                "pid": process_id,
                "beta": float(s.beta),
                "logz": round(float(logz), 10),
                "t": int(s.state.hist.t),
                "mean0": mean0,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
