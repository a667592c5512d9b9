"""Likelihood / prior-transform wrapping for the TPU execution model.

Replaces the reference's pool/map likelihood fan-out (core.py:317-358,
430-440): on TPU the model functions are JAX functions `vmap`-ed over the
(shardable) particle axis. Three dispatch modes:

- default: per-point JAX functions, vmapped;
- vectorize=True: functions already accept (N, d) batches;
- host_likelihood=True: arbitrary Python (non-JAX) likelihoods, bridged
  into jit via `jax.pure_callback` (the escape hatch for external codes).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .blobs import BlobSchema, infer_np_dtype_from_result


class FunctionWrapper:
    """Picklable closure binding extra args/kwargs (tools.py:270-309)."""

    def __init__(self, f: Callable, args: Optional[List[Any]], kwargs: Optional[Dict[str, Any]]):
        self.f = f
        self.args = [] if args is None else args
        self.kwargs = {} if kwargs is None else kwargs

    def __call__(self, x):
        return self.f(x, *self.args, **self.kwargs)


def build_prior_transform(prior_transform: Callable, vectorize: bool) -> Callable:
    """Batched u (N, d) -> x (N, d)."""
    if vectorize:
        return prior_transform
    return jax.vmap(prior_transform)


def _make_pool_map(pool) -> Callable:
    """Resolve the host-side map function from the `pool` argument.

    Parity with the reference's dispatch (core.py:430-440): None -> builtin
    map; int -> lazily-created multiprocessing pool of that size; object
    with .map (e.g. an MPI pool) -> its map. Only meaningful together with
    host_likelihood=True — the JAX paths are batched on device.
    """
    if pool is None:
        return lambda f, xs: [f(x) for x in xs]
    if isinstance(pool, int):
        state = {}

        def pooled_map(f, xs):
            if "pool" not in state:
                import multiprocessing

                # spawn: forking a process with an initialized JAX runtime
                # can deadlock; spawn requires f to be picklable (same
                # constraint as the reference's multiprocess pool).
                state["pool"] = multiprocessing.get_context("spawn").Pool(pool)
            return state["pool"].map(f, xs)

        return pooled_map
    if hasattr(pool, "map"):
        return lambda f, xs: list(pool.map(f, xs))
    raise ValueError(f"pool must be None, an int, or expose .map; got {type(pool)}")


def build_log_likelihood(
    log_likelihood: Callable,
    vectorize: bool,
    have_blobs: bool,
    host_likelihood: bool,
    n_particles: int,
    dtype=jnp.float32,
    schema: Optional[BlobSchema] = None,
    pool=None,
) -> Callable:
    """Batched x (N, d) -> (logl (N,), blobs (N, B) | None).

    `schema` (utils/blobs.BlobSchema) describes the device packing of the
    per-point blob payloads when have_blobs.
    """

    if host_likelihood:
        # Non-JAX escape hatch: evaluate on the host via a callback.
        pool_map = _make_pool_map(pool)
        if have_blobs:

            def host_eval(xs):
                out = pool_map(log_likelihood, list(np.asarray(xs)))
                logl = np.array([float(o[0]) for o in out], dtype=np.float32)
                items = [tuple(o[1:]) for o in out]
                return logl, schema.pack(items)

            shape = (
                jax.ShapeDtypeStruct((n_particles,), jnp.float32),
                jax.ShapeDtypeStruct((n_particles, schema.width), schema.device_dtype),
            )

            if schema.is_object:
                # pack() appends to the host-side payload store — a side
                # effect pure_callback is allowed to elide or replay;
                # io_callback guarantees exactly-once execution.
                from jax.experimental import io_callback

                def batched(x):
                    logl, blobs = io_callback(host_eval, shape, x)
                    return logl.astype(dtype), blobs

            else:

                def batched(x):
                    logl, blobs = jax.pure_callback(host_eval, shape, x)
                    return logl.astype(dtype), blobs

            return batched

        def host_eval_plain(xs):
            out = pool_map(log_likelihood, list(np.asarray(xs)))
            return np.array([float(v) for v in out], dtype=np.float32)

        def batched_plain(x):
            shape = jax.ShapeDtypeStruct((n_particles,), jnp.float32)
            logl = jax.pure_callback(host_eval_plain, shape, x)
            return logl.astype(dtype), None

        return batched_plain

    if vectorize:
        # Already-batched JAX function; blobs unsupported (config validates).
        def batched_vec(x):
            out = log_likelihood(x)
            return jnp.asarray(out, dtype=dtype), None

        return batched_vec

    if have_blobs:
        def per_point(x):
            out = log_likelihood(x)
            logl, elems = out[0], out[1:]
            # Reference packs ALL trailing return values into the blob
            # (core.py:331); flatten each and lay them out in order —
            # matching the structured-dtype field order when declared.
            flat = [jnp.atleast_1d(jnp.asarray(e)).reshape(-1) for e in elems]
            blob = jnp.concatenate(flat) if len(flat) > 1 else flat[0]
            return (
                jnp.asarray(logl, dtype=dtype),
                blob.astype(schema.device_dtype),
            )

        vmapped = jax.vmap(per_point)

        def batched_blob(x):
            logl, blobs = vmapped(x)
            return logl, blobs

        return batched_blob

    def per_point_plain(x):
        return jnp.asarray(log_likelihood(x), dtype=dtype)

    vmapped_plain = jax.vmap(per_point_plain)

    def batched_jax(x):
        return vmapped_plain(x), None

    return batched_jax


def build_blob_schema(
    log_likelihood: Callable,
    n_dim: int,
    have_blobs: bool,
    host_likelihood: bool,
    blobs_dtype=None,
    declared_size: Optional[int] = None,
    prior_transform: Optional[Callable] = None,
    vectorize: bool = False,
) -> Optional[BlobSchema]:
    """Determine the blob layout (utils/blobs.BlobSchema) — or None.

    Semantics mirror the reference's lazy detection (core.py:328-354), moved
    to construction time because device buffer shapes must be static:

    - `blobs_dtype` structured / object: the dtype fully determines the
      layout — no probing.
    - simple numeric `blobs_dtype` (or blobs auto-detected): the flattened
      width comes from `blob_size`, else from `jax.eval_shape` (abstract
      tracing — no likelihood executes) for JAX likelihoods, else from ONE
      real host evaluation at the prior midpoint (with a warning).
    - no `blobs_dtype`: JAX per-point likelihoods are shape-traced; a
      tuple return with >1 element means blobs exist (the reference's
      `isinstance(results[0], tuple)` probe), with the dtype inferred from
      the traced trailing elements. Host likelihoods require an explicit
      `blobs_dtype` (no-likelihood-calls-at-construction contract).
    """
    auto_detect = blobs_dtype is None and not have_blobs
    if auto_detect:
        if host_likelihood or vectorize:
            return None
        try:
            shape = jax.eval_shape(
                log_likelihood, jax.ShapeDtypeStruct((n_dim,), jnp.float32)
            )
        except Exception:
            return None
        if not isinstance(shape, (tuple, list)) or len(shape) < 2:
            return None
        elems = shape[1:]
        np_dtype = np.result_type(*[np.dtype(str(e.dtype)) for e in elems])
        width = sum(max(int(np.prod(e.shape)), 1) for e in elems)
        return BlobSchema(np_dtype, blob_size=width)

    if not have_blobs:
        return None

    dt = np.dtype(blobs_dtype) if blobs_dtype is not None else np.dtype(np.float32)
    if dt.fields is not None or dt.kind in "USO":
        return BlobSchema(dt)  # width determined by the dtype itself

    if declared_size is not None:
        return BlobSchema(dt, blob_size=int(declared_size))
    if host_likelihood:
        import warnings

        warnings.warn(
            "host_likelihood=True with blobs and no blob_size: inferring the "
            "blob width requires ONE likelihood evaluation at construction "
            "(at the prior midpoint). Pass blob_size=<int> (or a structured "
            "blobs_dtype) to avoid it for expensive or stateful likelihoods.",
            UserWarning,
            stacklevel=3,
        )
        mid = np.full(n_dim, 0.5)
        x_mid = np.asarray(prior_transform(mid)) if prior_transform is not None else mid
        out = log_likelihood(x_mid)
        width = int(sum(np.atleast_1d(e).size for e in out[1:]))
        if blobs_dtype is None:
            dt = infer_np_dtype_from_result(
                out[1] if len(out) == 2 else tuple(out[1:])
            )
            if dt.fields is not None or dt.kind in "USO":
                return BlobSchema(dt)
        return BlobSchema(dt, blob_size=width)
    shape = jax.eval_shape(log_likelihood, jax.ShapeDtypeStruct((n_dim,), jnp.float32))
    elems = shape[1:]
    width = sum(max(int(np.prod(e.shape)), 1) for e in elems)
    return BlobSchema(dt, blob_size=width)
