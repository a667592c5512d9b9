"""Generate tests/fixtures/v1_checkpoint.state — a format-v1 checkpoint.

v1 files (round-1 format) differ from current (v2) checkpoints in three
ways the loader must migrate (utils/checkpoint.py:106-166):

- coordinate buffers stored (T, N, d) / (T, N, B), not (d, T, N);
- no `hist.mis_c` accumulator (rebuilt via state.rebuild_mis_c on load);
- call counters in RAW call units with no `calls_units` marker (converted
  to sweep units on load).

This script runs a small deterministic sampler on the CPU backend, then
writes its state in the v1 encoding. The committed fixture is what
tests/test_checkpoint_compat.py loads; regenerate only if the fixture is
lost (a regenerated file is equivalent but not byte-identical).

    python tests/fixtures/make_v1_checkpoint.py
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tempest_tpu import Sampler


def main():
    def prior(u):
        return -10.0 + 20.0 * u

    def loglike(x):
        return -0.5 * jnp.sum(x * x, axis=-1)

    s = Sampler(
        prior, loglike, n_dim=3, n_particles=32, vectorize=True,
        clustering=False, random_state=7, history_capacity=24,
    )
    # A handful of iterations: enough history that the MIS accumulator
    # rebuild and the layout transpose are both non-trivial.
    for _ in range(6):
        s.sample()

    hist, cur, key = s.state.hist, s.state.cur, s.state.key
    n = cur.u.shape[0]

    arrays = {}
    # v1 layout: (T, N, d) coordinates; no mis_c entry.
    arrays["hist.u"] = np.moveaxis(np.asarray(hist.u), 0, -1)
    arrays["hist.x"] = np.moveaxis(np.asarray(hist.x), 0, -1)
    arrays["hist.logl"] = np.asarray(hist.logl)
    for name in ("beta", "logz", "ess", "cv", "acceptance", "efficiency", "steps"):
        arrays[f"hist.{name}"] = np.asarray(getattr(hist, name))
    # v1 stored RAW likelihood-call counts (sweeps * n_particles).
    arrays["hist.calls"] = np.asarray(hist.calls) * n
    arrays["hist.t"] = np.asarray(hist.t)
    arrays["cur.u"] = np.asarray(cur.u)
    arrays["cur.x"] = np.asarray(cur.x)
    arrays["cur.logl"] = np.asarray(cur.logl)
    arrays["cur.assignments"] = np.asarray(cur.assignments)
    for name in ("beta", "logz", "ess", "cv", "acceptance", "efficiency", "steps"):
        arrays[f"cur.{name}"] = np.asarray(getattr(cur, name))
    arrays["cur.calls"] = np.asarray(cur.calls) * n
    arrays["cur.iteration"] = np.asarray(cur.iteration)
    arrays["rng_key"] = np.asarray(jax.random.key_data(key)) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key
    ) else np.asarray(key)

    # v1 metadata: no format_version, no calls_units, no has_blob_store.
    payload = {"meta": {"n_total": 128, "random_state": 7}, "has_blobs": False}

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "v1_checkpoint.state")
    with open(out, "wb") as f:
        np.savez(f, __meta__=json.dumps(payload), **arrays)
    print("wrote", out)
    print("t =", int(hist.t), "beta =", float(cur.beta), "logz =", float(cur.logz))


if __name__ == "__main__":
    main()
