"""Checkpoint / resume: structured device-array state files.

TPU redesign of the reference's dill-based persistence
(/root/reference/tempest/core.py:249-315, state_manager.py:597-652): the
history and current-state pytrees are written as a single .npz plus JSON
metadata with the same atomic tmp-write + fsync + rename discipline. No
code objects are pickled — checkpoints are portable across processes and
hosts, and resume restores the iteration counter, RNG key state, and the
full masked history.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..state import Current, History
from .host import fetch, is_primary, sync

# v2: History coordinate buffers stored (d, T, N) / (B, T, N) (was
# (T, N, d) / (T, N, B) in v1) — see state.py layout notes.
_FORMAT_VERSION = 2


def _flatten_with_paths(tree, prefix):
    out = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        name = prefix + "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        # `fetch` gathers shards that span processes (multi-host safe);
        # plain np.asarray would raise on non-addressable arrays.
        out[name] = fetch(leaf)
    return out


def save_checkpoint(
    path: Union[str, Path],
    hist: History,
    cur: Current,
    key: jax.Array,
    meta: Optional[dict] = None,
    blob_store: Optional[list] = None,
) -> None:
    """Atomically write the full sampler state.

    Multi-process safe: every process participates in the shard gathers
    (collectives), the primary process alone writes the file, and a global
    barrier orders the write before anyone proceeds. Resume expects the
    file to be readable by each process (shared filesystem or local copy).
    """
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".temp")

    arrays = {}
    arrays.update(_flatten_with_paths(hist, "hist."))
    arrays.update(_flatten_with_paths(cur, "cur."))
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        arrays["rng_key"] = np.asarray(jax.random.key_data(key))
    else:  # legacy uint32 key
        arrays["rng_key"] = np.asarray(key)

    if not is_primary():
        sync("tempest_checkpoint")
        return
    path.parent.mkdir(parents=True, exist_ok=True)

    payload = {
        "format_version": _FORMAT_VERSION,
        "meta": meta or {},
        "has_blobs": hist.blobs is not None,
        # Call counters are stored in sweep units (1 sweep = n_particles
        # likelihood calls); absent in files from before the overflow fix.
        "calls_units": "sweeps",
        "has_blob_store": blob_store is not None,
    }
    if blob_store is not None:
        # Object/string blob payloads (utils/blobs.BlobSchema.store):
        # pickled inside the npz; the loader only enables allow_pickle for
        # files that declare this entry.
        arr = np.empty((len(blob_store),), dtype=object)
        arr[:] = blob_store
        arrays["blob_store"] = arr

    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(payload), **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    sync("tempest_checkpoint")


def load_checkpoint(
    path: Union[str, Path], dtype=jnp.float32
) -> Tuple[History, Current, jax.Array, dict, Optional[list]]:
    """Load a checkpoint written by save_checkpoint.

    Returns (hist, cur, key, meta, blob_store) — blob_store is None unless
    the file holds object-blob payloads (only such files need pickle).
    """
    with np.load(Path(path), allow_pickle=False) as probe:
        payload = json.loads(str(probe["__meta__"]))
    allow_pickle = bool(payload.get("has_blob_store", False))
    with np.load(Path(path), allow_pickle=allow_pickle) as data:
        payload = json.loads(str(data["__meta__"]))
        get = lambda name: jnp.asarray(data[name])
        has_blobs = payload["has_blobs"]
        legacy_layout = payload.get("format_version", 1) < 2

        def get_tdn(name):
            """History coordinate buffer, migrating v1 (T, N, B) files."""
            arr = get(name)
            return jnp.moveaxis(arr, -1, 0) if legacy_layout else arr

        hist = History(
            u=get_tdn("hist.u"),
            x=get_tdn("hist.x"),
            logl=get("hist.logl"),
            # Accumulator added later than format v1: rebuild if absent.
            mis_c=get("hist.mis_c") if "hist.mis_c" in data else None,
            blobs=get_tdn("hist.blobs") if has_blobs else None,
            beta=get("hist.beta"),
            logz=get("hist.logz"),
            ess=get("hist.ess"),
            cv=get("hist.cv"),
            acceptance=get("hist.acceptance"),
            efficiency=get("hist.efficiency"),
            steps=get("hist.steps"),
            calls=get("hist.calls"),
            t=get("hist.t"),
        )
        cur = Current(
            u=get("cur.u"),
            x=get("cur.x"),
            logl=get("cur.logl"),
            blobs=get("cur.blobs") if has_blobs else None,
            assignments=get("cur.assignments"),
            beta=get("cur.beta"),
            logz=get("cur.logz"),
            ess=get("cur.ess"),
            cv=get("cur.cv"),
            acceptance=get("cur.acceptance"),
            efficiency=get("cur.efficiency"),
            steps=get("cur.steps"),
            calls=get("cur.calls"),
            iteration=get("cur.iteration"),
        )
        if hist.mis_c is None:
            from ..state import rebuild_mis_c

            hist = rebuild_mis_c(
                hist.replace(
                    mis_c=jnp.full(hist.logl.shape, -jnp.inf, dtype=hist.logl.dtype)
                )
            )
        if payload.get("calls_units") != "sweeps":
            # Legacy file with raw call counts: convert to sweep units.
            n = cur.u.shape[0]
            hist = hist.replace(calls=hist.calls // n)
            cur = cur.replace(calls=cur.calls // n)
        key = jnp.asarray(data["rng_key"])  # legacy uint32 key format
        store = None
        if allow_pickle and "blob_store" in data:
            store = list(data["blob_store"])
        return hist, cur, key, payload["meta"], store
