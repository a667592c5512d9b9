"""Vectorized adaptive MCMC mutation kernels (tpCN and RWM).

TPU-native redesign of /root/reference/tempest/mcmc.py:8-323. The reference
runs a Python `while True` with *per-walker Python loops* for proposals and
prior transforms; here the entire adaptive run — proposal generation,
bounded boundary-retry, batched likelihood, Metropolis acceptance,
per-cluster Robbins-Monro step-size adaptation, and the adaptive-step
termination rule — is a single `lax.while_loop` inside one jitted program.
All per-walker work is batched over the (shardable) particle axis; per-
cluster reductions use one-hot matmuls that lower to psum under pjit.

Semantics preserved exactly (citations inline):
- tpCN proposal u' = mu + sqrt(1-s^2)(u-mu) + s*sqrt(g)*L z with the
  inverse-gamma mixture scale g (mcmc.py:225-249)
- Student-t density-ratio acceptance factor (mcmc.py:251-279)
- tempered Metropolis rule alpha = min(1, exp(beta*dlogl + factor)), NaN->0
  (mcmc.py:163-166)
- sigma adaptation toward 0.234 with tpcn clipping to [0, min(2.38/sqrt(d),
  0.99)] (mcmc.py:281-288) and unclipped rwm updates (mcmc.py:320-323)
- adaptive termination n_steps*d*(0.234/acc)*(sigma_0/sigma)^2 clamped to
  [n_steps*d, n_max*d] (mcmc.py:104-140)

One deliberate deviation: the reference redraws out-of-bounds proposals
forever (mcmc.py:239-249); we draw `n_candidates` i.i.d. candidates per
walker in one batched pass, take the first in-bounds one (identical in
distribution to sequential redrawing truncated at n_candidates), and force
rejection (alpha=0) for walkers with none — keeping the proposal stage a
single fixed-shape computation with no data-dependent loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .modes import ModeStatistics
from .ops.boundary import apply_boundary_conditions, check_bounds
from .ops.pallas_prng import (
    fused_draws_supported,
    hw_gamma,
    hw_mutation_draws,
    hw_normal,
    hw_prng_supported,
)

# hardware_prng size gates (measured, benchmarks/results/mutation_roofline.json):
# below these the hardware path is at or above the threefry cost because
# kernel-launch overhead dominates the draw itself.
_HW_NORMAL_MIN_ELEMS = 1 << 20
_HW_GAMMA_MIN_WALKERS = 1 << 16


class MCMCResult(NamedTuple):
    u: jnp.ndarray
    x: jnp.ndarray
    logl: jnp.ndarray
    blobs: Optional[jnp.ndarray]
    efficiency: jnp.ndarray
    acceptance: jnp.ndarray
    steps: jnp.ndarray
    # Likelihood calls in SWEEP units: one sweep = one batched evaluation of
    # all n_walkers particles, so raw calls = n_call_sweeps * n_walkers.
    # Counting sweeps keeps the int32 device counter overflow-safe: raw call
    # counts pass 2^31 within ~30 min of TPU time at bench throughput, sweep
    # counts never realistically do (state.py stores the cumulative sweep
    # count; hosts convert with Python integers).
    n_call_sweeps: jnp.ndarray


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.where(mask, values, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def _mode_quadratic(diff: jnp.ndarray, assignments: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """Per-walker Mahalanobis form diff_n^T M_{a(n)} diff_n -> (N,).

    A per-walker gather `mats[assignments]` would materialize an (N, d, d)
    buffer — 4 TB at N=1e6, d=100. Instead loop over the K_max modes with
    one (N, d) x (d, d) matmul each: O(N*d) memory, K*N*d^2 flops that run
    on the MXU (dense matmuls) instead of the per-walker batched matvecs
    the gather formulation lowers to.
    """
    K = mats.shape[0]
    N = diff.shape[0]

    def body(k, acc):
        v = diff @ mats[k]  # (N, d)
        dk = jnp.sum(v * diff, axis=1)
        return acc + jnp.where(assignments == k, dk, 0.0)

    return jax.lax.fori_loop(0, K, body, jnp.zeros((N,), diff.dtype))


def _mode_matmul(z: jnp.ndarray, assignments: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """Per-walker z_rn @ M_{a(n)}^T for z (R, N, d) -> (R, N, d).

    Same memory rationale as _mode_quadratic: never materialize
    mats[assignments] (N, d, d)."""
    K = mats.shape[0]

    def body(k, acc):
        s = jnp.einsum("rnj,ij->rni", z, mats[k])
        return acc + jnp.where((assignments == k)[None, :, None], s, 0.0)

    return jax.lax.fori_loop(0, K, body, jnp.zeros_like(z))


# Above this many gathered-matrix elements (N * d^2) the per-walker
# Cholesky/inverse gather is avoided and the K-loop formulations above are
# used instead. Below it, the gather is materialized ONCE before the MCMC
# while_loop and each step runs 3 dense batched einsums instead of
# 3 * K_max sequential masked matmuls — the K-loop's sequential small ops
# dominated the measured per-step cost at flagship scale (N=1024, d=10,
# K=16: ~48 tiny matmuls per step). The crossover is LATENCY vs
# BANDWIDTH, not memory capacity: the gathered einsums are per-sample
# matvec batches that cannot use the MXU and re-read the (N, d, d)
# factors every step (round-4 roofline: at N=2^18 the gathered step ran
# 21x over the HBM bound; the K-loop's K dense (N*R, d) x (d, d) MXU
# matmuls are the bandwidth-efficient form), so the gather is only worth
# its latency advantage while the matrices are small enough to live in
# cache-adjacent HBM traffic.
_GATHER_ELEMS_LIMIT = 1 << 21  # 2M elems = 8 MB fp32 per matrix set


def _gathered_quadratic(diff: jnp.ndarray, mats_w: jnp.ndarray) -> jnp.ndarray:
    """diff_n^T M_n diff_n for pre-gathered per-walker matrices (N, d, d)."""
    v = jnp.einsum("nj,nji->ni", diff, mats_w)
    return jnp.sum(v * diff, axis=1)


def _gathered_matmul(z: jnp.ndarray, mats_w: jnp.ndarray) -> jnp.ndarray:
    """z_rn @ M_n^T for pre-gathered per-walker matrices: (R, N, d)."""
    return jnp.einsum("rnj,nij->rni", z, mats_w)


def make_mcmc_kernel(
    log_likelihood_batch: Callable,
    prior_transform_batch: Callable,
    n_dim: int,
    method: str = "tpcn",
    n_steps: int = 1,
    n_max_steps: int = 20,
    periodic_mask: Optional[jnp.ndarray] = None,
    reflective_mask: Optional[jnp.ndarray] = None,
    strict_mask: Optional[jnp.ndarray] = None,
    n_candidates: int = 8,
    have_blobs: bool = False,
    hardware_prng: bool = False,
):
    """Build the jitted adaptive-MCMC mutation function.

    log_likelihood_batch: x (N, d) -> (logl (N,), blobs (N, B) | None)
    prior_transform_batch: u (N, d) -> x (N, d)
    """
    if periodic_mask is None:
        periodic_mask = jnp.zeros((n_dim,), dtype=bool)
    if reflective_mask is None:
        reflective_mask = jnp.zeros((n_dim,), dtype=bool)
    if strict_mask is None:
        strict_mask = ~(periodic_mask | reflective_mask)

    sigma_0 = 2.38 / jnp.sqrt(jnp.asarray(float(n_dim)))
    sigma_cap = jnp.minimum(sigma_0, 0.99)
    is_tpcn = method == "tpcn"

    def propose(key, u, diff, mu, mode_step, sigma_w, scale_w, z_pre=None):
        """Multi-candidate proposal; returns (proposal, valid) per walker.

        The reference redraws each out-of-bounds walker until it lands in
        bounds (mcmc.py:239-249). A sequential redraw loop is pathological
        on TPU: the round count scales with log(N) times the per-draw
        invalid probability's tail, and each round replays the whole
        proposal computation (measured ~10ms/step during warm-up). Instead
        draw `n_candidates` i.i.d. candidates per walker in ONE batched
        pass and take the first valid one — identical in distribution to
        sequential redrawing truncated at n_candidates; walkers with no
        valid candidate are rejected via alpha=0 (an event adaptation
        quickly makes rare, since forced rejections shrink sigma).
        """
        R = n_candidates
        n_elems = R * u.shape[0] * u.shape[1]
        if z_pre is not None:
            # Pre-drawn by the fused single-launch hardware kernel.
            z = z_pre
        elif hardware_prng and hw_prng_supported(u.dtype) and n_elems >= _HW_NORMAL_MIN_ELEMS:
            # Hardware-PRNG draws (different, equally valid RNG stream —
            # see config.hardware_prng); 2.1x faster than threefry at
            # large N (ops/pallas_prng.py). Size-gated: below ~1M draws
            # both paths are at the launch-overhead floor.
            z = hw_normal(key, (R,) + u.shape, dtype=u.dtype)
        else:
            z = jax.random.normal(key, (R,) + u.shape, dtype=u.dtype)  # (R, N, d)
        step = mode_step(z)  # z_rn @ L_{a(n)}^T
        if is_tpcn:
            cand = (
                mu
                + jnp.sqrt(1.0 - sigma_w**2)[:, None] * diff
                + (sigma_w * scale_w)[:, None] * step
            )
        else:
            cand = u + sigma_w[:, None] * step
        cand = apply_boundary_conditions(cand, periodic_mask, reflective_mask)
        valid = check_bounds(cand, strict_mask)  # (R, N)

        # First-valid selection as an unrolled where-chain (R is static):
        # scanning last-to-first leaves the FIRST valid candidate in
        # `prop`, with a final where forcing candidate 0 when none is
        # valid — bit-identical to argmax + take_along_axis over the R
        # axis, but 6.4-7.6x faster on TPU (the gather lowers poorly;
        # measured at N=2^14 and 2^18, benchmarks/results/
        # candidate_select_ab.json).
        any_valid = jnp.any(valid, axis=0)
        prop = cand[R - 1]
        for r in range(R - 2, -1, -1):
            prop = jnp.where(valid[r][:, None], cand[r], prop)
        prop = jnp.where(any_valid[:, None], prop, cand[0])
        return prop, any_valid

    def run(
        key: jax.Array,
        u: jnp.ndarray,
        x: jnp.ndarray,
        logl: jnp.ndarray,
        blobs: Optional[jnp.ndarray],
        assignments: jnp.ndarray,
        beta: jnp.ndarray,
        modes: ModeStatistics,
    ) -> MCMCResult:
        n_walkers = u.shape[0]
        k_max = modes.k_max
        dtype = u.dtype

        if is_tpcn:
            sigmas0 = jnp.full((k_max,), sigma_cap, dtype=dtype)
        else:
            sigmas0 = jnp.full((k_max,), sigma_0, dtype=dtype)

        mu = modes.means[assignments]  # (N, d)
        dof_w = modes.degrees_of_freedom[assignments]  # (N,)
        chol_all = modes.chol_covariances  # (K, d, d)
        inv_all = modes.inv_covariances  # (K, d, d)

        # Assignments are frozen for the whole mutation, so at small/medium
        # scale the per-walker matrices are gathered ONCE here and every
        # step runs dense batched einsums; past _GATHER_ELEMS_LIMIT the
        # (N, d, d) buffers are a memory hazard and the K-loop masked
        # formulations are used instead (shape-static choice at trace time).
        if n_walkers * n_dim * n_dim <= _GATHER_ELEMS_LIMIT:
            chol_w = chol_all[assignments]  # (N, d, d)
            inv_w = inv_all[assignments]
            quad = lambda diff: _gathered_quadratic(diff, inv_w)
            mode_step = lambda z: _gathered_matmul(z, chol_w)
        else:
            quad = lambda diff: _mode_quadratic(diff, assignments, inv_all)
            mode_step = lambda z: _mode_matmul(z, assignments, chol_all)

        onehot = (assignments[:, None] == jnp.arange(k_max)[None, :]).astype(dtype)
        count_k = jnp.sum(onehot, axis=0)  # (k_max,)
        n_steps_min = jnp.asarray(n_steps * n_dim, dtype)
        n_steps_cap = jnp.asarray(n_max_steps * n_dim, dtype)

        # Fused single-launch hardware draws: at flagship-scale walker
        # counts the step is launch-latency bound and XLA's threefry gamma
        # alone is ~31 us of the ~75 us step; ONE Pallas kernel drawing
        # the proposal normals + Marsaglia-Tsang gammas + acceptance
        # uniforms measures 2.0 us vs 30.9 us for the threefry chain
        # (same flagship shapes). Gated to tpCN (the gamma consumer), the
        # hardware_prng flag (different, equally valid RNG stream), and
        # sizes whose z block fits scoped VMEM.
        use_fused_draws = (
            hardware_prng
            and is_tpcn
            and fused_draws_supported(
                n_candidates * n_walkers * n_dim, n_walkers, dtype
            )
        )

        def cond(carry):
            return ~carry["done"]

        def body(carry):
            key = carry["key"]
            u, x, logl, blobs = carry["u"], carry["x"], carry["logl"], carry["blobs"]
            sigmas = carry["sigmas"]
            iteration = carry["iteration"] + 1

            key, k_g, k_p, k_a = jax.random.split(key, 4)

            sigma_w = sigmas[assignments]
            diff = u - mu
            z_pre = u_acc = None
            if is_tpcn:
                # inverse-gamma mixture scale per walker (mcmc.py:233-236)
                dot = quad(diff)
                g_shape = (n_dim + dof_w) / 2.0
                g_scale = 2.0 / (dof_w + dot)
                if use_fused_draws:
                    z_pre, g, u_acc = hw_mutation_draws(
                        k_g, g_shape, (n_candidates,) + u.shape, dtype=dtype
                    )
                elif (
                    hardware_prng
                    and hw_prng_supported(dtype)
                    and n_walkers >= _HW_GAMMA_MIN_WALKERS
                ):
                    # 12x faster than XLA's threefry gamma at N=2^18
                    # (0.995 -> 0.079 ms); statistical-only equivalence.
                    # Size-gated: the unrolled Marsaglia-Tsang rounds are
                    # ~13 kernel launches, which LOSE below ~64k walkers
                    # (measured 0.077 vs 0.031 ms at N=1024).
                    g = hw_gamma(k_g, g_shape, dtype=dtype)
                else:
                    g = jax.random.gamma(k_g, g_shape, dtype=dtype)
                s_mix = 1.0 / (g * g_scale)
                scale_w = jnp.sqrt(s_mix)
            else:
                dot = jnp.zeros_like(logl)
                scale_w = jnp.ones_like(logl)

            u_prime, valid = propose(
                k_p, u, diff, mu, mode_step, sigma_w, scale_w, z_pre=z_pre
            )
            x_prime = prior_transform_batch(u_prime)
            logl_prime, blobs_prime = log_likelihood_batch(x_prime)
            logl_prime = logl_prime.astype(dtype)

            if is_tpcn:
                # Student-t log-density ratio (mcmc.py:251-279)
                diff_p = u_prime - mu
                dot_p = quad(diff_p)
                coeff = -0.5 * (n_dim + dof_w)
                log_cur = coeff * jnp.log1p(dot / dof_w)
                log_prp = coeff * jnp.log1p(dot_p / dof_w)
                factor = -log_prp + log_cur
            else:
                factor = jnp.zeros_like(logl)

            alpha = jnp.exp(beta * (logl_prime - logl) + factor)
            alpha = jnp.minimum(1.0, alpha)
            alpha = jnp.nan_to_num(alpha, nan=0.0)
            alpha = jnp.where(valid, alpha, 0.0)

            if u_acc is not None:
                accept = u_acc < alpha
            else:
                accept = jax.random.uniform(k_a, (n_walkers,), dtype=dtype) < alpha
            u = jnp.where(accept[:, None], u_prime, u)
            x = jnp.where(accept[:, None], x_prime, x)
            logl = jnp.where(accept, logl_prime, logl)
            if have_blobs:
                blobs = jnp.where(accept[:, None], blobs_prime, blobs)

            # Per-cluster Robbins-Monro adaptation toward 0.234
            # (mcmc.py:179-186, 281-288, 320-323). All per-trip reductions
            # over the sharded walker axis ride ONE fused sum (-> a single
            # all-reduce per MCMC step under SPMD, instead of one each for
            # the cluster sums, the acceptance mean, and the alpha mean).
            cols = jnp.concatenate(
                [
                    onehot * alpha[:, None],
                    accept.astype(dtype)[:, None],
                    alpha[:, None],
                ],
                axis=1,
            )  # (N, k_max + 2)
            sums = jnp.sum(cols, axis=0)
            alpha_k = sums[:k_max]  # (k_max,)
            mean_accept = sums[k_max] / n_walkers
            mean_alpha = sums[k_max + 1] / n_walkers
            mean_acc_k = alpha_k / jnp.maximum(count_k, 1.0)
            rate = 1.0 / (iteration.astype(dtype) + 1.0)
            if is_tpcn:
                new_sigmas = jnp.clip(
                    sigmas + rate * (mean_acc_k - 0.234), 0.0, sigma_cap
                )
            else:
                new_sigmas = sigmas + rate * (mean_acc_k - 0.234)
            sigmas = jnp.where(count_k > 0, new_sigmas, sigmas)

            # Adaptive termination (mcmc.py:104-140): population-weighted
            # sigma over non-empty clusters.
            acc = mean_accept
            w_sigma = jnp.sum(count_k * sigmas) / jnp.maximum(jnp.sum(count_k), 1.0)
            n_adaptive = (
                n_steps_min
                * (0.234 / jnp.maximum(0.01, acc))
                * (sigma_0 / jnp.maximum(1e-6, w_sigma)) ** 2
            )
            n_final = jnp.clip(n_adaptive, n_steps_min, n_steps_cap)
            done = iteration.astype(dtype) >= n_final

            return {
                "key": key,
                "u": u,
                "x": x,
                "logl": logl,
                "blobs": blobs,
                "sigmas": sigmas,
                "iteration": iteration,
                "alpha_mean": mean_alpha,
                "done": done,
            }

        init = {
            "key": key,
            "u": u,
            "x": x,
            "logl": logl,
            "blobs": blobs,
            "sigmas": sigmas0,
            "iteration": jnp.asarray(0, jnp.int32),
            "alpha_mean": jnp.asarray(0.0, dtype),
            "done": jnp.asarray(False),
        }
        out = jax.lax.while_loop(cond, body, init)

        efficiency = _masked_mean(out["sigmas"], modes.k_mask) / sigma_0
        return MCMCResult(
            u=out["u"],
            x=out["x"],
            logl=out["logl"],
            blobs=out["blobs"],
            efficiency=efficiency,
            acceptance=out["alpha_mean"],
            steps=out["iteration"],
            # Every loop step evaluates the likelihood on the full walker
            # batch exactly once, so sweeps == steps.
            n_call_sweeps=out["iteration"],
        )

    return jax.jit(run)
