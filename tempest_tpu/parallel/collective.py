"""Explicit-collective (shard_map) implementations of the two stages whose
communication the XLA SPMD partitioner cannot schedule well on its own.

Everything else in the pipeline — the MIS weight math, the MCMC mutation,
the commit — partitions cleanly under pjit because it is elementwise or a
reduction over the (T, N) sample axes. Two stages are different:

1. **Resampling** draws the new active set from the *global* weight CDF and
   gathers the selected rows from the sharded history. As a plain gather
   the partitioner must all-gather the whole (d, T, N) history to every
   device (O(S*d) bytes, and O(S*d) *memory* per device — fatal at 1M
   particles). Here each shard computes its slice of the canonical-order
   CDF from per-row shard offsets (an all-gather of (n_shards, T) scalars),
   claims the stratified positions that land in its intervals, and the
   selected rows are combined with one reduce-scatter — O(N*d) bytes total
   and O(N*d) memory.

2. **Fit-point selection** (top-m by weight for the geometry fits) is a
   global top-k over the sharded weights, which XLA lowers as
   gather-and-sort-replicated. Here each shard top-k's locally and one
   all-gather of m candidates per shard merges them — O(n_shards*m*d)
   bytes. The merged fit set is *replicated*, which is exactly what the
   (tiny) clustering/Student-t EM fits want: they run identically on every
   shard with zero further communication.

The canonical sample order is t-major (s = t*N + n), matching the
unsharded steps/resample.py path, so sharded and unsharded runs make the
same selections up to float reduction-order noise in the CDF.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..state import History


def _positions(key: jax.Array, n: int, dtype, method: str) -> jnp.ndarray:
    """Stratified (syst) or i.i.d. (mult) CDF positions in [0, 1).

    Bit-identical to the draws in ops/tools.systematic_resample /
    multinomial_resample for the same key.
    """
    if method == "syst":
        u0 = jax.random.uniform(key, ())
        return (u0 + jnp.arange(n, dtype=dtype)) / n
    if method == "mult":
        return jax.random.uniform(key, (n,), dtype=dtype)
    raise ValueError(f"Unknown resample method {method}")


def _local_cdf(w_loc: jnp.ndarray, axis: str) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-shard canonical-order CDF intervals.

    Returns (cdf, prev, total): flattened local arrays (T*N_loc,) where
    local sample (t, j) owns the global CDF interval (prev, cdf], and the
    scalar global total weight. Canonical order is t-major with shard
    blocks of N_loc inside each row.
    """
    n_shards = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)

    r = jnp.sum(w_loc, axis=1)  # (T,) my per-row mass
    all_r = jax.lax.all_gather(r, axis)  # (n_shards, T)
    row_tot = jnp.sum(all_r, axis=0)  # (T,)
    # Exclusive prefix over rows, then over preceding shards within the row.
    G = jnp.cumsum(row_tot) - row_tot  # (T,)
    pre = jnp.sum(
        jnp.where((jnp.arange(n_shards) < me)[:, None], all_r, 0.0), axis=0
    )  # (T,)
    offset = G + pre  # (T,) my block's start in each row

    c = jnp.cumsum(w_loc, axis=1) + offset[:, None]  # (T, N_loc)
    prev = jnp.concatenate([offset[:, None], c[:, :-1]], axis=1)
    total = G[-1] + row_tot[-1]
    return c.reshape(-1), prev.reshape(-1), total


def _claim(cdf: jnp.ndarray, prev: jnp.ndarray, total, positions: jnp.ndarray):
    """Which positions this shard serves, and with which local flat index.

    Position p is claimed by the unique sample whose interval (prev, cdf]
    contains it. Positions are clamped into (0, total] so the guard the
    unsharded path applies (cdf[-1] = 1.0 against rounding shortfall) has
    the same effect here.
    """
    size = cdf.shape[0]
    tiny = jnp.finfo(cdf.dtype).tiny
    p = jnp.clip(positions.astype(cdf.dtype), tiny, total)
    li = jnp.searchsorted(cdf, p, side="left")
    liC = jnp.clip(li, 0, size - 1)
    claimed = (li < size) & (prev[liC] < p) & (cdf[liC] >= p)
    return claimed, liC


def sharded_resample(
    key: jax.Array,
    mesh: Mesh,
    axis: str,
    hist: History,
    weights: jnp.ndarray,
    n_active: int,
    method: str = "mult",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Distributed resampling: O(N*d) communication, no history gather.

    Returns (u, x, logl, blobs) for the new active set, sharded on the
    particle axis (contiguous blocks of positions per shard, matching the
    Current sharding).
    """
    T, N = weights.shape
    d = hist.u.shape[0]
    have_blobs = hist.blobs is not None
    positions = _positions(key, n_active, weights.dtype, method)

    def body(w_loc, u_loc, x_loc, logl_loc, pos, *rest):
        N_loc = w_loc.shape[1]
        cdf, prev, total = _local_cdf(w_loc, axis)
        claimed, li = _claim(cdf, prev, total, pos)
        t_idx, n_idx = li // N_loc, li % N_loc

        def take(arr_dtn):  # (B, T, N_loc) -> (n_active, B) masked partial
            # Flattened single-axis gather (see state.gather_history).
            vals = arr_dtn.reshape(arr_dtn.shape[0], -1)[:, li].T
            return jnp.where(claimed[:, None], vals, 0.0)

        logl_p = jnp.where(claimed, logl_loc.reshape(-1)[li], 0.0)
        out = [
            jax.lax.psum_scatter(take(u_loc), axis, scatter_dimension=0, tiled=True),
            jax.lax.psum_scatter(take(x_loc), axis, scatter_dimension=0, tiled=True),
            jax.lax.psum_scatter(logl_p, axis, scatter_dimension=0, tiled=True),
        ]
        if have_blobs:
            out.append(
                jax.lax.psum_scatter(
                    take(rest[0]), axis, scatter_dimension=0, tiled=True
                )
            )
        return tuple(out)

    pdim2 = P(None, axis)
    pdim3 = P(None, None, axis)
    in_specs = [pdim2, pdim3, pdim3, pdim2, P()]
    out_specs = [P(axis, None), P(axis, None), P(axis)]
    args = [weights, hist.u, hist.x, hist.logl, positions]
    if have_blobs:
        in_specs.append(pdim3)
        out_specs.append(P(axis, None))
        args.append(hist.blobs)
    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        check_vma=False,
    )(*args)
    u, x, logl = out[:3]
    return u, x, logl, (out[3] if have_blobs else None)


def sharded_select_fit_points(
    mesh: Mesh,
    axis: str,
    u: jnp.ndarray,
    weights: jnp.ndarray,
    t: jnp.ndarray,
    m: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trimmed global top-m samples by weight, replicated on every shard.

    Returns (u_fit (m, d), w_fit (m,), keep (m,)), matching the unsharded
    trim-then-top-m selection (fused._mutate_branch) — communication is one
    all-gather of min(m, S/n_shards) candidates per shard, never the
    history.

    When the per-shard candidate budget covers each shard entirely
    (m >= S/n_shards, true for every test-scale problem and the default
    train_max_points at moderate history sizes), the gathered set IS the
    full weight vector, so the 0.99-ESS trim (ops/tools.trim_weights_mask)
    runs on it with the exact unsharded semantics, and the final top-m is
    tie-broken by canonical sample index — the selection, its order, and
    its weights are identical to the unsharded path. For larger histories
    the trim is skipped (documented deviation): every sample that could
    survive both trim and top-m is inside the local top-m candidates, and
    the selection's weights are renormalized over the candidates instead —
    the discarded tail carries ~zero weight in the weighted EM fits either
    way.
    """
    from ..config import TRIM_BINS, TRIM_ESS
    from ..ops.tools import trim_weights_mask

    d = u.shape[0]
    T, N = weights.shape

    def body(w_loc, u_loc, t):
        n_shards = jax.lax.psum(1, axis)
        me = jax.lax.axis_index(axis)
        N_loc = w_loc.shape[1]
        S_loc = T * N_loc
        w_flat = w_loc.reshape(-1)
        k_loc = min(m, S_loc)
        full = k_loc == S_loc  # static

        vals, li = jax.lax.top_k(w_flat, k_loc)
        t_idx, n_idx = li // N_loc, li % N_loc
        rows = u_loc.reshape(d, -1)[:, li].T  # (k_loc, d)
        gidx = t_idx * N + me * N_loc + n_idx  # canonical flat sample index

        all_vals = jax.lax.all_gather(vals, axis).reshape(-1)  # (C,)
        all_idx = jax.lax.all_gather(gidx, axis).reshape(-1)
        all_rows = jax.lax.all_gather(rows, axis).reshape(-1, d)
        C = all_vals.shape[0]

        if full:
            # Full coverage: exact unsharded trim semantics (percentiles
            # over all valid samples, zeros included).
            valid = (all_idx // N) < t
            keep_cand, w_cand = trim_weights_mask(
                all_vals, mask=valid, ess=TRIM_ESS, bins=TRIM_BINS
            )
        else:
            keep_cand = all_vals > 0
            w_cand = all_vals / jnp.maximum(
                jnp.sum(all_vals), jnp.finfo(all_vals.dtype).tiny
            )

        if m >= T * N:
            # Selecting the whole history: the unsharded path passes it in
            # canonical order with the trim keep-mask — reproduce both.
            perm = jnp.argsort(all_idx)
        else:
            # Stable top-m: weight descending, canonical index ascending on
            # ties — the exact order jax.lax.top_k produces on the
            # unsharded flat vector, so downstream fixed-seed fits see
            # identical inputs.
            perm = jnp.arange(C, dtype=jnp.int32)
            _, _, perm = jax.lax.sort((-w_cand, all_idx, perm), num_keys=2)
        sel = perm[:m] if C > m else perm
        return all_rows[sel], w_cand[sel], keep_cand[sel]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None, axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(weights, u, t)
