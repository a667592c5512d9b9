"""A/B micro-bench: first-valid candidate selection in `propose()`.

Variant A (shipped through round 4): `jnp.take_along_axis` over the R
candidate axis — a gather whose lowering at large N was suspected slow
(VERDICT r4 weak #2). Variant B: an unrolled where-chain over R=8 that
scans candidates last-to-first so the survivor is the first valid row,
forced to candidate 0 when none is valid (bit-identical to A's argmax
gather, including the none-valid case).

Timing: differential fori harness per the round-3/4 prescription — the
SAME jitted executable is invoked at trip counts T and 3T (traced bound,
so one compile) on index-perturbed inputs, t_per_trip = (w_3T - w_T)/2T.
Interleaved A/B ordering; the relay cannot memoize because arguments
differ per invocation.

Run: python benchmarks/candidate_select_ab.py
Writes: benchmarks/results/candidate_select_ab.json
"""

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

R = 8
D = 10


def select_gather(cand, valid):
    first = jnp.argmax(valid, axis=0)  # (N,)
    return jnp.take_along_axis(cand, first[None, :, None], axis=0)[0]


def select_where_chain(cand, valid):
    # Last-to-first scan: after the loop `prop` holds the FIRST valid
    # candidate; if none is valid every where falls through to cand[R-1],
    # so a final where forces candidate 0 to match argmax's none-valid 0.
    prop = cand[R - 1]
    for r in range(R - 2, -1, -1):
        prop = jnp.where(valid[r][:, None], cand[r], prop)
    any_valid = jnp.any(valid, axis=0)
    return jnp.where(any_valid[:, None], prop, cand[0])


def make_timed(select, n):
    @jax.jit
    def f(x0, n_trips):
        def body(i, x):
            # Evolve inputs from the carry so nothing hoists out of the
            # loop; both variants share this prelude identically.
            fi = x[:, 0] + jnp.float32(1e-6) * i
            cand = x[None, :, :] + jnp.sin(
                fi[None, :, None] * (1.0 + jnp.arange(R, dtype=x.dtype))[:, None, None]
            )
            valid = cand[..., 0] > 0.0  # (R, N)
            prop = select(cand, valid)
            return x + jnp.float32(1e-3) * (prop - x)

        return jax.lax.fori_loop(0, n_trips, body, x0)

    return f


def bench_variant(f, x0, trips):
    w = {}
    for t in (trips, 3 * trips):
        t0 = time.time()
        out = f(x0, jnp.asarray(t, jnp.int32))
        float(jnp.sum(out))  # genuine value fetch
        w[t] = time.time() - t0
    return (w[3 * trips] - w[trips]) / (2 * trips)


def main():
    results = {"R": R, "d": D, "device": str(jax.devices()[0]), "configs": []}
    for logn, trips in ((14, 200), (18, 30)):
        n = 1 << logn
        rng = np.random.default_rng(logn)
        fa = make_timed(select_gather, n)
        fb = make_timed(select_where_chain, n)
        # warm both compiles before timing
        xw = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
        float(jnp.sum(fa(xw, jnp.asarray(2, jnp.int32))))
        float(jnp.sum(fb(xw, jnp.asarray(2, jnp.int32))))
        ta, tb = [], []
        for rep in range(3):  # interleaved A/B, fresh inputs each rep
            x0 = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
            ta.append(bench_variant(fa, x0, trips))
            tb.append(bench_variant(fb, x0, trips))
        med_a = sorted(ta)[1]
        med_b = sorted(tb)[1]
        results["configs"].append(
            {
                "n_walkers": n,
                "trips": trips,
                "gather_us_per_trip": round(med_a * 1e6, 2),
                "where_chain_us_per_trip": round(med_b * 1e6, 2),
                "gather_runs_us": [round(t * 1e6, 2) for t in ta],
                "where_runs_us": [round(t * 1e6, 2) for t in tb],
                "speedup_where_over_gather": round(med_a / med_b, 3),
            }
        )
        print(json.dumps(results["configs"][-1]))

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "candidate_select_ab.json"
    )
    with open(path, "w") as fjson:
        json.dump(results, fjson, indent=2)
        fjson.write("\n")


if __name__ == "__main__":
    main()
