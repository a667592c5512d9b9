"""Roofline attribution of the tpCN mutation sweep (VERDICT r3 item 7).

Measures the per-step cost of the adaptive tpCN sweep with the on-device
fori-repeat harness (the only trustworthy timing on the tunneled backend —
see CLAUDE.md), then compares against an analytic bytes/FLOPs model and
the chip's peaks to answer: is the XLA sweep near speed-of-light, and
would a fused Pallas proposal+accept kernel pay?

Two regimes are measured:
- flagship shape (N=1024, d=10): every per-step array is tens of KB, so
  the bound is per-kernel dispatch/fusion LATENCY, not bandwidth or FLOPs;
- large-ensemble shape (N=2^18, d=10): arrays are ~10 MB and the sweep
  should track the HBM roofline.

Writes benchmarks/results/mutation_roofline.json (+ prints a summary).

Usage:
    python benchmarks/mutation_roofline.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tempest_tpu.mcmc import make_mcmc_kernel
from tempest_tpu.modes import make_mode_statistics

N_DIM = 10
N_CAND = 8
STEPS_PER_SWEEP = 20  # n_steps = n_max_steps=2 => exactly 2*d steps

# Public single-chip peaks by device kind (prefix match).
_PEAKS = {
    "TPU v5 lite": {"hbm_gbps": 819.0, "f32_tflops": 49.0},
    "TPU v5": {"hbm_gbps": 2765.0, "f32_tflops": 115.0},
    "TPU v4": {"hbm_gbps": 1228.0, "f32_tflops": 69.0},
    "TPU v6": {"hbm_gbps": 1640.0, "f32_tflops": 230.0},
}


def _peaks():
    kind = jax.devices()[0].device_kind
    for prefix in sorted(_PEAKS, key=len, reverse=True):
        if kind.startswith(prefix):
            return kind, _PEAKS[prefix]
    return kind, {"hbm_gbps": float("nan"), "f32_tflops": float("nan")}


def prior_batch(u):
    return -10.0 + 20.0 * u


def loglike_batch(x):
    return (
        -jnp.sum(
            100.0 * (x[..., 1::2] - x[..., ::2] ** 2) ** 2
            + (1.0 - x[..., ::2]) ** 2,
            axis=-1,
        ),
        None,
    )


def measure_sweep(n_walkers, repeats=10, samples=3):
    """Median per-sweep ms via DIFFERENTIAL fori-repeat.

    One dispatch + value fetch through the axon tunnel costs a constant
    ~35 ms that a single timed call cannot separate from the kernel; the
    same jitted program is therefore run at trip counts R and 3R (traced
    fori bound — one executable) and the per-rep cost is
    (wall_3R - wall_R) / 2R, cancelling the tunnel/dispatch constant.
    Inputs are index-perturbed so the relay memoizer cannot serve cached
    results."""
    kernel = make_mcmc_kernel(
        loglike_batch, prior_batch, N_DIM, method="tpcn",
        n_steps=2, n_max_steps=2, n_candidates=N_CAND,
    )
    modes = make_mode_statistics(
        means=jnp.full((1, N_DIM), 0.5, jnp.float32),
        covariances=jnp.eye(N_DIM, dtype=jnp.float32)[None] * 0.01,
        degrees_of_freedom=jnp.array([1e6], jnp.float32),
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0.3, 0.7, (n_walkers, N_DIM)), jnp.float32)
    x = prior_batch(u)
    logl, _ = loglike_batch(x)
    assignments = jnp.zeros((n_walkers,), jnp.int32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def rep(beta0, reps):
        def body(i, carry):
            acc, k = carry
            k, sub = jax.random.split(k)
            res = kernel(
                sub, u, x, logl, None, assignments,
                beta0 * (1.0 + 0.001 * jnp.float32(i)), modes,
            )
            return acc + jnp.sum(res.logl), k

        out, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), key))
        return out

    float(rep(jnp.float32(0.5), repeats))  # compile + first exec
    diffs = []
    for t in range(samples):
        t0 = time.time()
        float(rep(jnp.float32(0.5 + 0.01 * t), repeats))
        w_lo = time.time() - t0
        t0 = time.time()
        float(rep(jnp.float32(0.7 + 0.01 * t), 3 * repeats))
        w_hi = time.time() - t0
        diffs.append((w_hi - w_lo) / (2 * repeats) * 1e3)
    return max(sorted(diffs)[len(diffs) // 2], 1e-6)


def measure_rng(n_walkers, repeats=10, samples=3):
    """Median per-step cost of the step's RNG draws alone (differential
    fori harness — see measure_sweep for why single-R timing is invalid
    on the tunneled backend)."""
    import numpy as np

    out = {}

    def fori(stage):
        @jax.jit
        def rep(x0, reps):
            def body(i, carry):
                acc, k = carry
                k, sub = jax.random.split(k)
                return acc + stage(sub, x0 * (1.0 + 1e-4 * jnp.float32(i))), k

            o, _ = jax.lax.fori_loop(
                0, reps, body, (jnp.float32(0.0), jax.random.PRNGKey(0))
            )
            return o

        float(rep(jnp.float32(1.0), repeats))
        diffs = []
        for t in range(samples):
            t0 = time.time()
            float(rep(jnp.float32(1.0 + 0.01 * t), repeats))
            w_lo = time.time() - t0
            t0 = time.time()
            float(rep(jnp.float32(1.3 + 0.01 * t), 3 * repeats))
            w_hi = time.time() - t0
            diffs.append((w_hi - w_lo) / (2 * repeats) * 1e3)
        return round(max(sorted(diffs)[len(diffs) // 2], 0.0), 3)

    out["normal_candidates_ms"] = fori(
        lambda k, s: jnp.sum(jax.random.normal(k, (N_CAND, n_walkers, N_DIM))) * 0 + s * 0
    )
    # tpCN inverse-gamma mixture scale: shape (d + dof)/2 per walker.
    out["gamma_mixture_ms"] = fori(
        lambda k, s: jnp.sum(
            jax.random.gamma(k, jnp.full((n_walkers,), 5.005) * (1 + s * 0))
        ) * 0
    )

    # Same draws from the hardware PRNG (config.hardware_prng=True path).
    from tempest_tpu.ops.pallas_prng import hw_gamma, hw_normal

    out["hw_normal_candidates_ms"] = fori(
        lambda k, s: jnp.sum(hw_normal(k, (N_CAND, n_walkers, N_DIM))) * 0 + s * 0
    )
    out["hw_gamma_mixture_ms"] = fori(
        lambda k, s: jnp.sum(
            hw_gamma(k, jnp.full((n_walkers,), 5.005) * (1 + s * 0))
        ) * 0
    )
    return out


def analytic_model(n_walkers):
    """Per-STEP bytes moved and FLOPs for the tpCN step (f32).

    Counts every (N, d) / (R, N, d) array the step body reads or writes
    once per access (mcmc.py body): proposal candidates, boundary checks,
    prior transform, likelihood, two Mahalanobis quadratics, acceptance
    selects, and the reduction columns. Deliberately generous to XLA (no
    credit for fusion re-use), so the bandwidth bound is an UPPER estimate
    of required traffic.
    """
    N, d, R = n_walkers, N_DIM, N_CAND
    f = 4  # f32 bytes
    nd = N * d * f
    rnd = R * N * d * f
    bytes_moved = (
        # normal draws z (write+read), mode_step output (w+r), candidates
        # (w+r), boundary-checked cand + valid (r/w), chosen proposal (w+r)
        2 * rnd * 3 + 2 * nd
        # diff, quad reads of u/mu; x', logl'; accept selects on u/x/logl
        + nd * 8 + 3 * N * f * 4
    )
    flops = (
        R * N * d * d * 2  # candidate step matmul z @ L^T
        + 2 * N * d * d * 2  # two Mahalanobis quadratics
        + R * N * d * 4  # boundary apply/check + candidate arithmetic
        + N * d * 10  # likelihood + prior transform (elementwise)
        + N * 40  # gamma draw, acceptance, RM bookkeeping
    )
    return bytes_moved, flops


def main():
    kind, peaks = _peaks()
    report = {"device": kind, "peaks": peaks, "shapes": []}

    for n_walkers in (1024, 1 << 18):
        sweep_ms = measure_sweep(n_walkers)
        step_us = sweep_ms * 1e3 / STEPS_PER_SWEEP
        bytes_moved, flops = analytic_model(n_walkers)
        t_bw_us = bytes_moved / (peaks["hbm_gbps"] * 1e9) * 1e6
        t_fl_us = flops / (peaks["f32_tflops"] * 1e12) * 1e6
        bound = max(t_bw_us, t_fl_us)
        rec = {
            "n_walkers": n_walkers,
            "sweep_ms": round(sweep_ms, 3),
            "steps_per_sweep": STEPS_PER_SWEEP,
            "step_us_measured": round(step_us, 2),
            "step_bytes_model": bytes_moved,
            "step_flops_model": flops,
            "step_us_hbm_bound": round(t_bw_us, 2),
            "step_us_flops_bound": round(t_fl_us, 2),
            "fraction_of_roofline": round(bound / step_us, 4),
            "overhead_factor": round(step_us / bound, 1),
            "rng_attribution": measure_rng(n_walkers),
        }
        report["shapes"].append(rec)
        print(json.dumps(rec), flush=True)

    small, large = report["shapes"]
    parts = []
    sb = max(small["step_us_hbm_bound"], small["step_us_flops_bound"])
    if small["overhead_factor"] >= 3:
        parts.append(
            f"Flagship shape (N=1024): one tpCN step measures "
            f"{small['step_us_measured']} us vs a {sb} us roofline bound "
            f"({small['overhead_factor']}x overhead) — dispatch/latency-"
            "bound (a chain of sub-100KB kernels per step), not bandwidth- "
            "or FLOP-bound. A Pallas fusion of the proposal+accept math "
            "cannot remove the user likelihood/prior kernel boundary that "
            "sits in the middle of every step, so its ceiling is the "
            "fraction of per-step kernels it absorbs."
        )
    else:
        parts.append(
            f"Flagship shape (N=1024): step at {small['overhead_factor']}x "
            "of the roofline bound — close enough that a Pallas rewrite "
            "has little headroom."
        )
    if large["fraction_of_roofline"] >= 0.5:
        parts.append(
            f"Large-ensemble shape (N=2^18): measured step runs at "
            f"{large['fraction_of_roofline']:.0%} of the analytic HBM "
            "roofline — XLA is at (modeled) speed of light; a Pallas "
            "rewrite has no headroom worth its complexity there."
        )
    else:
        rng = large["rng_attribution"]
        rng_ms = rng["normal_candidates_ms"] + rng["gamma_mixture_ms"]
        hw_ms = rng["hw_normal_candidates_ms"] + rng["hw_gamma_mixture_ms"]
        step_ms = large["sweep_ms"] / STEPS_PER_SWEEP
        parts.append(
            f"Large-ensemble shape (N=2^18): step at "
            f"{large['fraction_of_roofline']:.0%} of the analytic HBM "
            f"roofline, and the gap is RNG, not data movement: the step's "
            f"threefry normal candidates ({rng['normal_candidates_ms']} ms) "
            f"plus the rejection-sampled inverse-gamma mixture scale "
            f"({rng['gamma_mixture_ms']} ms) alone account for ~"
            f"{rng_ms / step_ms:.0%} of the "
            "measured step. The fix is BUILT as of round 5: "
            "config.hardware_prng=True draws both from the TPU hardware "
            "PRNG (ops/pallas_prng.py — paired Box-Muller normals "
            f"{rng['hw_normal_candidates_ms']} ms, Marsaglia-Tsang gamma "
            f"{rng['hw_gamma_mixture_ms']} ms), cutting the step's RNG "
            f"share to ~{hw_ms / max(step_ms - rng_ms + hw_ms, 1e-9):.1%}. "
            "Default off: the hardware stream is statistically equivalent "
            "but not bit-compatible with threefry replays."
        )
    report["conclusion"] = " ".join(parts)
    out = "benchmarks/results/mutation_roofline.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
