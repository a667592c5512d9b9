"""Particle state: preallocated, masked device buffers.

TPU-native redesign of the reference StateManager
(/root/reference/tempest/state_manager.py:52-685). Where the reference keeps
Python lists of per-iteration arrays, we keep rectangular device buffers
with an iteration counter ``t``; slots ``>= t`` are masked out of every
computation. This keeps all shapes static under jit and lets the whole
history live sharded on-device (particle axis = mesh axis).

Buffer layout (chosen for TPU tiling and SPMD sharding):

- coordinates ``u``/``x`` are ``(d, T_max, N)`` — the particle axis N is the
  *minor* dimension (tiled to 128 lanes, which a sharded particle axis
  satisfies by construction) and T_max the second-to-minor (tiled to 8,
  satisfied by the power-of-two capacities). A ``(T, N, d)`` layout would
  pad d to 128 lanes and physically cost 12.8x its logical bytes at d=10.
- scalars-per-sample ``logl``/``mis_c`` are ``(T_max, N)``.
- log-weights and weights on the hot path are ``(T_max, N)`` as well.
  Nothing on the device path ever reshapes ``(T, N)`` into ``(T*N,)``:
  merging the sharded minor axis with the replicated T axis produces an
  interleaved order XLA cannot express as a sharding, forcing a full
  all-gather of the history on every use (measured: ~18 MB of all-gathers
  per iteration before this layout).

The mathematical heart of Persistent Sampling — the multiple-importance-
sampling (balance heuristic) weight computation (state_manager.py:418-480) —
is `compute_logw_and_logz` below, a fused masked computation that XLA maps
onto the VPU and, under a sharded particle axis, lowers to per-shard
reductions plus psum.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .ops.tools import logsumexp


@struct.dataclass
class History:
    """Rectangular particle history. Valid iterations: [0, t)."""

    u: jnp.ndarray  # (d, T_max, N) unit-hypercube coordinates
    x: jnp.ndarray  # (d, T_max, N) physical coordinates
    logl: jnp.ndarray  # (T_max, N) log-likelihoods
    # Running MIS-denominator accumulator, maintained by commit():
    #   mis_c[t', s] = logsumexp_{t <= T} (beta_t * logl[t', s] - logZ_t)
    # Because n_particles is constant per iteration, the balance-heuristic
    # mixture weight log(n_t/N_total) = -log(T) factors OUT of the
    # logsumexp, so the full denominator is mis_c - log(T): every weight
    # computation is O(S) instead of O(S*T) (state_manager.py:466-471
    # rebuilds the full matrix each time).
    mis_c: jnp.ndarray  # (T_max, N)
    blobs: Optional[jnp.ndarray]  # (B, T_max, N) auxiliary outputs or None
    beta: jnp.ndarray  # (T_max,) inverse temperature per iteration
    logz: jnp.ndarray  # (T_max,) evidence estimate per iteration
    ess: jnp.ndarray  # (T_max,)
    cv: jnp.ndarray  # (T_max,)
    acceptance: jnp.ndarray  # (T_max,)
    efficiency: jnp.ndarray  # (T_max,)
    steps: jnp.ndarray  # (T_max,) int32
    # Cumulative likelihood calls in SWEEP units (1 sweep = n_particles
    # calls; every call site — warm-up draw or MCMC step — evaluates the
    # full particle batch, so the raw count is always a multiple of N).
    # int32 sweeps never realistically overflow, whereas raw int32 call
    # counts pass 2^31 within ~30 min of TPU bench throughput. Hosts
    # convert to raw calls with Python integers (core.calls_total()).
    calls: jnp.ndarray  # (T_max,) int32 cumulative likelihood-call SWEEPS
    t: jnp.ndarray  # () int32 — number of committed iterations

    # ------------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.u.shape[1]

    @property
    def n_particles(self) -> int:
        return self.u.shape[2]

    @property
    def n_dim(self) -> int:
        return self.u.shape[0]

    @property
    def blob_size(self) -> Optional[int]:
        return None if self.blobs is None else self.blobs.shape[0]

    def iter_mask(self) -> jnp.ndarray:
        """(T_max,) bool — which iteration slots are valid."""
        return jnp.arange(self.capacity) < self.t

    def sample_mask(self) -> jnp.ndarray:
        """(T_max, N) bool — which history samples are valid."""
        return jnp.broadcast_to(
            self.iter_mask()[:, None], (self.capacity, self.n_particles)
        )

    # -- flat canonical-order views (host/analysis convenience ONLY) -------
    # These materialize a transposed copy and, on a sharded history, force
    # an all-gather: never call them on the device hot path (use
    # gather_history / the (T, N)-shaped math instead).
    def flat_u(self) -> jnp.ndarray:
        return jnp.moveaxis(self.u, 0, -1).reshape(-1, self.n_dim)

    def flat_x(self) -> jnp.ndarray:
        return jnp.moveaxis(self.x, 0, -1).reshape(-1, self.n_dim)

    def flat_logl(self) -> jnp.ndarray:
        return self.logl.reshape(-1)

    def flat_blobs(self) -> Optional[jnp.ndarray]:
        if self.blobs is None:
            return None
        return jnp.moveaxis(self.blobs, 0, -1).reshape(-1, self.blobs.shape[0])


def gather_history(
    hist: History, t_idx: jnp.ndarray, n_idx: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Gather (u, x, logl, blobs) rows for sample coordinates (t, n).

    Returns u/x as (k, d) and blobs as (k, B). Single-program gather for
    the unsharded path; the sharded path uses the claim-based collective
    gather in parallel/collective.py instead (an all-to-all-sized psum
    rather than a full-history all-gather).
    """
    # Flattened single-axis gather instead of a 2-axis advanced index:
    # the (t, n) form lowers to a general 2-vector gather for which
    # XLA:TPU's layout assignment materializes layout-transposed copies of
    # the FULL history inside the whole-run program (measured: two ~4 GiB
    # remat copies of (100, 192, 49152) u — the compile-OOM at large N x d).
    # A 1-D gather along the flattened minor axis keeps the operand in its
    # native (d, T, N) layout. reshape is free (contiguous).
    s_idx = t_idx * hist.u.shape[2] + n_idx
    d = hist.u.shape[0]
    u = hist.u.reshape(d, -1)[:, s_idx].T  # (k, d)
    x = hist.x.reshape(d, -1)[:, s_idx].T
    logl = hist.logl.reshape(-1)[s_idx]
    blobs = (
        None
        if hist.blobs is None
        else hist.blobs.reshape(hist.blobs.shape[0], -1)[:, s_idx].T
    )
    return u, x, logl, blobs


def make_history(
    capacity: int,
    n_particles: int,
    n_dim: int,
    dtype=jnp.float32,
    blob_size: Optional[int] = None,
    blobs_dtype=None,
) -> History:
    """Allocate an empty history buffer."""
    f = lambda *shape: jnp.zeros(shape, dtype=dtype)
    blobs = None
    if blob_size is not None:
        blobs = jnp.zeros((blob_size, capacity, n_particles), dtype=blobs_dtype or dtype)
    return History(
        u=f(n_dim, capacity, n_particles),
        x=f(n_dim, capacity, n_particles),
        logl=jnp.full((capacity, n_particles), -jnp.inf, dtype=dtype),
        mis_c=jnp.full((capacity, n_particles), -jnp.inf, dtype=dtype),
        blobs=blobs,
        beta=f(capacity),
        logz=f(capacity),
        ess=f(capacity),
        cv=f(capacity),
        acceptance=f(capacity),
        efficiency=f(capacity),
        steps=jnp.zeros((capacity,), dtype=jnp.int32),
        calls=jnp.zeros((capacity,), dtype=jnp.int32),
        t=jnp.asarray(0, dtype=jnp.int32),
    )


def grow_history(hist: History, new_capacity: int) -> History:
    """Grow capacity (host-side, outside jit). Contents preserved."""
    cap = hist.capacity
    assert new_capacity > cap

    def pad(arr, fill=0.0, axis=0):
        pad_shape = list(arr.shape)
        pad_shape[axis] = new_capacity - cap
        return jnp.concatenate(
            [arr, jnp.full(tuple(pad_shape), fill, dtype=arr.dtype)], axis=axis
        )

    return History(
        u=pad(hist.u, axis=1),
        x=pad(hist.x, axis=1),
        logl=pad(hist.logl, -jnp.inf),
        mis_c=pad(hist.mis_c, -jnp.inf),
        blobs=None if hist.blobs is None else pad(hist.blobs, axis=1),
        beta=pad(hist.beta),
        logz=pad(hist.logz),
        ess=pad(hist.ess),
        cv=pad(hist.cv),
        acceptance=pad(hist.acceptance),
        efficiency=pad(hist.efficiency),
        steps=pad(hist.steps),
        calls=pad(hist.calls),
        t=hist.t,
    )


@struct.dataclass
class Current:
    """Active particle set + per-iteration scalars (device-resident)."""

    u: jnp.ndarray  # (N, d)
    x: jnp.ndarray  # (N, d)
    logl: jnp.ndarray  # (N,)
    blobs: Optional[jnp.ndarray]  # (N, B) or None
    assignments: jnp.ndarray  # (N,) int32 cluster labels
    beta: jnp.ndarray  # () scalar
    logz: jnp.ndarray
    ess: jnp.ndarray
    cv: jnp.ndarray
    acceptance: jnp.ndarray
    efficiency: jnp.ndarray
    steps: jnp.ndarray  # () int32
    calls: jnp.ndarray  # () int32 cumulative likelihood-call SWEEPS (see History.calls)
    iteration: jnp.ndarray  # () int32


def make_current(
    n_particles: int,
    n_dim: int,
    dtype=jnp.float32,
    blob_size: Optional[int] = None,
    blobs_dtype=None,
) -> Current:
    blobs = None
    if blob_size is not None:
        blobs = jnp.zeros((n_particles, blob_size), dtype=blobs_dtype or dtype)
    z = lambda: jnp.asarray(0.0, dtype=dtype)
    return Current(
        u=jnp.zeros((n_particles, n_dim), dtype=dtype),
        x=jnp.zeros((n_particles, n_dim), dtype=dtype),
        logl=jnp.full((n_particles,), -jnp.inf, dtype=dtype),
        blobs=blobs,
        assignments=jnp.zeros((n_particles,), dtype=jnp.int32),
        beta=z(),
        logz=z(),
        ess=z(),
        cv=z(),
        acceptance=z(),
        efficiency=z(),
        steps=jnp.asarray(0, dtype=jnp.int32),
        calls=jnp.asarray(0, dtype=jnp.int32),
        iteration=jnp.asarray(0, dtype=jnp.int32),
    )


def _mis_c_after_commit(hist: History, cur: Current) -> jnp.ndarray:
    """Updated (T_max, N) accumulator including the new iteration's column.

    Existing samples: one logaddexp with the new (beta_T, logZ_T) term —
    O(S). The new iteration's row: logsumexp over all T+1 committed
    temperatures — O(N*T_max). beta*logl is forced to -inf for -inf logl
    (0 * -inf would be NaN; the matrix formulation masks these the same
    way).
    """
    t = hist.t
    dtype = hist.logl.dtype
    beta_T = jnp.asarray(cur.beta, dtype)
    logz_T = jnp.asarray(cur.logz, dtype)

    # --- update rows of existing iterations (slots < t) -------------------
    term = jnp.where(
        jnp.isfinite(hist.logl), beta_T * hist.logl - logz_T, -jnp.inf
    )
    row_valid = (jnp.arange(hist.capacity) < t)[:, None]
    mis_c = jnp.where(row_valid, jnp.logaddexp(hist.mis_c, term), hist.mis_c)

    # --- build the new iteration's row over all t' <= t -------------------
    betas = hist.beta.at[t].set(beta_T)  # (T_max,)
    logzs = hist.logz.at[t].set(logz_T)
    col_valid = jnp.arange(hist.capacity) <= t  # (T_max,)
    vals = jnp.where(
        jnp.isfinite(cur.logl)[None, :],
        betas[:, None] * cur.logl[None, :] - logzs[:, None],
        -jnp.inf,
    )
    vals = jnp.where(col_valid[:, None], vals, -jnp.inf)
    new_row = logsumexp(vals, axis=0)  # (N,)
    return jax.lax.dynamic_update_index_in_dim(mis_c, new_row, t, 0)


def commit(hist: History, cur: Current) -> History:
    """Append the current state as iteration slot `t` (jit-safe).

    Parity: state_manager.py:356-416 (commit_current_to_history); caller must
    ensure capacity > t (grow on host first). Also maintains the running
    MIS-denominator accumulator (see History.mis_c).
    """
    t = hist.t
    return hist.replace(
        mis_c=_mis_c_after_commit(hist, cur),
        u=jax.lax.dynamic_update_index_in_dim(hist.u, cur.u.T, t, 1),
        x=jax.lax.dynamic_update_index_in_dim(hist.x, cur.x.T, t, 1),
        logl=jax.lax.dynamic_update_index_in_dim(hist.logl, cur.logl, t, 0),
        blobs=None
        if hist.blobs is None
        else jax.lax.dynamic_update_index_in_dim(hist.blobs, cur.blobs.T, t, 1),
        beta=hist.beta.at[t].set(cur.beta),
        logz=hist.logz.at[t].set(cur.logz),
        ess=hist.ess.at[t].set(cur.ess),
        cv=hist.cv.at[t].set(cur.cv),
        acceptance=hist.acceptance.at[t].set(cur.acceptance),
        efficiency=hist.efficiency.at[t].set(cur.efficiency),
        steps=hist.steps.at[t].set(cur.steps),
        calls=hist.calls.at[t].set(cur.calls),
        t=t + 1,
    )


# ---------------------------------------------------------------------------
# The MIS / balance-heuristic weight computation — the heart of PS.
# ---------------------------------------------------------------------------
def mis_denominator(hist: History) -> jnp.ndarray:
    """Beta-independent denominator of the MIS balance heuristic — O(S).

    B_s = logsumexp_t[ log(n_t/N_total) + beta_t * logl_s - logZ_t ]
        = mis_c_s - log(T)          (constant n_particles => n_t/N = 1/T)

    Reads the accumulator maintained by commit() (History.mis_c) instead of
    rebuilding the (S x T) matrix the reference constructs for every
    evaluation (state_manager.py:466-471). Shape: (T_max, N).
    """
    log_T = jnp.log(jnp.maximum(hist.t, 1).astype(hist.logl.dtype))
    return hist.mis_c - log_T


def mis_denominator_exact(hist: History) -> jnp.ndarray:
    """Full-matrix O(S*T) denominator — reference formulation. (T_max, N).

    Used to (re)build History.mis_c (e.g. for checkpoints written before
    the accumulator existed) and as the ground truth in tests. Computed as
    a scan over committed rows so peak memory stays O(N*T) instead of
    O(N*T^2).
    """
    it_mask = hist.iter_mask()  # (T_max,)
    # log(n_t / N_total) = log(N) - log(t*N) = -log(t)
    log_mix = jnp.where(
        it_mask, -jnp.log(jnp.maximum(hist.t, 1).astype(hist.logl.dtype)), -jnp.inf
    )

    def row(logl_row):
        # b[n, t] = beta_t * logl_row_n - logZ_t + log_mix_t, invalid
        # columns forced to -inf BEFORE the logsumexp (uninitialized slots
        # have beta_t = 0 and logl = -inf whose product is NaN otherwise).
        b = logl_row[:, None] * hist.beta[None, :] - hist.logz[None, :] + log_mix[None, :]
        b = jnp.where(it_mask[None, :], b, -jnp.inf)
        return logsumexp(b, axis=1)  # (N,)

    return jax.lax.map(row, hist.logl)  # (T_max, N)


def rebuild_mis_c(hist: History) -> History:
    """Recompute the accumulator from scratch (checkpoint compatibility)."""
    log_T = jnp.log(jnp.maximum(hist.t, 1).astype(hist.logl.dtype))
    c = mis_denominator_exact(hist) + log_T
    c = jnp.where(hist.iter_mask()[:, None], c, -jnp.inf)
    return hist.replace(mis_c=c)


def logw_from_denominator(
    hist: History, denom: jnp.ndarray, beta_final, normalize: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Log-weights (T_max, N) and logZ at `beta_final` given a denominator.

    logw_s = beta_final * logl_s - B_s;  logz = logsumexp_s(logw_s) - log(N).
    O(T_max*N) — the cheap, beta-dependent half of the MIS computation.
    """
    _, N = hist.logl.shape
    s_mask = hist.sample_mask()
    n_total = (hist.t * N).astype(hist.logl.dtype)

    beta_final = jnp.asarray(beta_final, dtype=hist.logl.dtype)
    # Guard -inf log-likelihoods: their denominator is also -inf (the
    # accumulator masks them), and -inf - (-inf) = NaN would poison the
    # normalizing logsumexp. Such samples carry exactly zero weight. (The
    # warm-up patch keeps -inf out of committed history in normal runs —
    # mutate.py:124-148 in the reference — this is defense in depth.)
    logw = jnp.where(
        s_mask & jnp.isfinite(hist.logl), beta_final * hist.logl - denom, -jnp.inf
    )
    logz_new = logsumexp(logw) - jnp.log(jnp.maximum(n_total, 1.0))
    logz_new = jnp.where(hist.t > 0, logz_new, -jnp.inf)

    if normalize:
        logw = logw - logsumexp(logw)
    return logw, logz_new


def bootstrap_logz_err(
    hist: History, key: jax.Array, n_bootstrap: int = 256, beta_final=1.0
) -> jnp.ndarray:
    """Iteration-block bootstrap standard error of the MIS logZ estimate.

    The reference returns logz_err = None unconditionally
    (/root/reference/tempest/core.py:244-247); this provides the error bar
    it lacks. The estimator logZ = logsumexp_s(logw_s) - log(N*t)
    decomposes over iteration blocks: with L_t = logsumexp_n(logw[t, :]),
    logZ = logsumexp_t(L_t) - log(N*t). Samples within an iteration share
    an MCMC ancestry and a ladder position, so blocks — not samples — are
    the approximately-independent unit: resample t blocks with replacement
    and take the std of the replicate logZs. O(T_max * n_bootstrap) work on
    the (T_max,) block vector — the (T, N) weight pass runs once.

    Caveat (documented in docs/user_guide/advanced.md): the MIS
    denominators couple blocks through the shared temperature ladder, so
    this is the standard block-bootstrap approximation; validated against
    the multi-seed scatter on the 50-D Gaussian and 25-D funnel benchmarks
    (benchmarks/results/accuracy_parity.json).
    """
    logw, _ = logw_from_denominator(hist, mis_denominator(hist), beta_final, normalize=False)
    L = logsumexp(logw, axis=1)  # (T_max,) block logsumexps, -inf when invalid
    T_max = hist.capacity
    t = jnp.maximum(hist.t, 1)
    n_total = (t * hist.n_particles).astype(L.dtype)

    # (B, T_max) random block indices in [0, t); slots j >= t are masked.
    u = jax.random.uniform(key, (n_bootstrap, T_max))
    idx = jnp.minimum((u * t).astype(jnp.int32), t - 1)
    draws = L[idx]  # (B, T_max)
    draws = jnp.where(jnp.arange(T_max)[None, :] < t, draws, -jnp.inf)
    logz_b = logsumexp(draws, axis=1) - jnp.log(n_total)
    mean = jnp.mean(logz_b)
    return jnp.sqrt(jnp.mean((logz_b - mean) ** 2))


def compute_logw_and_logz(
    hist: History, beta_final, normalize: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance log-weights for ALL historical samples at `beta_final`.

    Exact semantics of state_manager.py:418-480 with constant n_particles per
    iteration (true in the reference as well):

        logw_s = beta_final * logl_s
                 - logsumexp_t[ log(n_t/N) + beta_t * logl_s - logZ_t ]
        logz   = logsumexp_s(logw_s) - log(N)

    Returns logw with shape (T_max, N); invalid iterations get -inf. All
    shapes fixed; under a sharded particle axis the reductions lower to
    psum over the mesh.
    """
    return logw_from_denominator(hist, mis_denominator(hist), beta_final, normalize)
