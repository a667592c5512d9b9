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


# ---------------------------------------------------------------------------
# Per-host sharded checkpoints (multi-process; no global gather)
# ---------------------------------------------------------------------------
# Layout of a sharded checkpoint DIRECTORY `<path>/`:
#   shard_<pid>/<leaf>.npy   each process's contiguous particle-axis slab,
#                            written by that process only (tmp+rename)
#   replicated.npz           replicated leaves + rng key (primary only)
#   meta.json                manifest: shapes, particle-axis index and the
#                            [start, stop) range each process saved;
#                            written LAST by the primary = commit marker.
# Resume reads each leaf through jax.make_array_from_callback: every
# process mmap-loads ONLY the ranges covering its addressable shards, so
# save is O(local) writes and load is O(local) reads at ANY process count
# (reshard-on-load comes for free from the callback indexing).


def _particle_axis_index(leaf) -> Optional[int]:
    """Axis sharded over the mesh, or None if fully replicated."""
    sharding = getattr(leaf, "sharding", None)
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return None
    for i, entry in enumerate(spec):
        if entry is not None:
            return i
    return None


def _leaf_dict(hist: History, cur: Current) -> dict:
    out = {}
    for prefix, tree in (("hist.", hist), ("cur.", cur)):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in leaves:
            name = prefix + "/".join(
                str(getattr(p, "name", getattr(p, "idx", p))) for p in path
            )
            out[name] = leaf
    return out


def save_checkpoint_sharded(
    path: Union[str, Path],
    hist: History,
    cur: Current,
    key: jax.Array,
    meta: Optional[dict] = None,
) -> None:
    """Write a per-host sharded checkpoint: each process persists only its
    addressable shards (SURVEY §7.8). No collective, no global gather —
    peak host memory is O(local shards)."""
    path = Path(path)
    pid = jax.process_index()
    path.mkdir(parents=True, exist_ok=True)

    leaves = _leaf_dict(hist, cur)
    manifest_leaves = {}
    replicated = {}

    tmp_dir = path / f".shard_{pid}.tmp"
    tmp_dir.mkdir(parents=True, exist_ok=True)
    my_ranges = {}
    for name, leaf in leaves.items():
        if leaf is None:
            continue
        ax = _particle_axis_index(leaf)
        if ax is None:
            if pid == 0:
                replicated[name] = np.asarray(
                    leaf.addressable_shards[0].data
                    if hasattr(leaf, "addressable_shards")
                    else leaf
                )
            manifest_leaves[name] = {
                "shape": list(np.shape(leaf)),
                "dtype": str(np.asarray(jnp.zeros((), leaf.dtype)).dtype),
                "axis": None,
            }
            continue
        # Collect this process's addressable slabs; with a 1-D particle
        # mesh and default device order they are contiguous along `ax`.
        shards = sorted(
            leaf.addressable_shards, key=lambda s: s.index[ax].start or 0
        )
        datas = [np.asarray(s.data) for s in shards]
        starts = [s.index[ax].start or 0 for s in shards]
        stops = [
            s.index[ax].stop if s.index[ax].stop is not None else leaf.shape[ax]
            for s in shards
        ]
        for i in range(1, len(shards)):
            if starts[i] != stops[i - 1]:
                raise ValueError(
                    f"non-contiguous addressable shards for {name}; "
                    "per-host checkpointing requires a 1-D particle mesh in "
                    "process-major device order"
                )
        slab = np.concatenate(datas, axis=ax) if len(datas) > 1 else datas[0]
        np.save(tmp_dir / (name + ".npy"), slab)
        my_ranges[name] = [int(starts[0]), int(stops[-1])]
        manifest_leaves[name] = {
            "shape": list(leaf.shape),
            "dtype": str(slab.dtype),
            "axis": ax,
        }

    final_dir = path / f"shard_{pid}"
    if final_dir.exists():
        import shutil

        shutil.rmtree(final_dir)
    os.rename(tmp_dir, final_dir)

    # Every process reports its ranges through its own tiny manifest; the
    # primary merges them after the barrier. (Ranges are deterministic from
    # the mesh, but writing them out keeps the loader mesh-agnostic.)
    with open(final_dir / "ranges.json", "w") as f:
        json.dump(my_ranges, f)

    sync("tempest_sharded_ckpt_write")

    if pid == 0:
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            replicated["rng_key"] = np.asarray(jax.random.key_data(key))
        else:
            replicated["rng_key"] = np.asarray(key)
        with open(path / "replicated.npz.tmp", "wb") as f:
            np.savez(f, **replicated)
            f.flush()
            os.fsync(f.fileno())
        os.rename(path / "replicated.npz.tmp", path / "replicated.npz")

        ranges = {}
        for p in range(jax.process_count()):
            with open(path / f"shard_{p}" / "ranges.json") as f:
                ranges[str(p)] = json.load(f)
        manifest = {
            "format_version": _FORMAT_VERSION,
            "kind": "sharded",
            "n_processes": jax.process_count(),
            "meta": meta or {},
            "has_blobs": hist.blobs is not None,
            "calls_units": "sweeps",
            "leaves": manifest_leaves,
            "ranges": ranges,
        }
        with open(path / "meta.json.tmp", "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(path / "meta.json.tmp", path / "meta.json")
    sync("tempest_sharded_ckpt_commit")


def load_checkpoint_sharded(
    path: Union[str, Path],
    mesh,
    axis_name: str = "particles",
) -> Tuple[History, Current, jax.Array, dict]:
    """Load a per-host sharded checkpoint onto `mesh`.

    Each process reads only the file ranges covering its own addressable
    shards (numpy mmap partial reads), so resume is O(local) regardless of
    how many processes wrote the checkpoint — process-count changes
    reshard transparently.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    path = Path(path)
    with open(path / "meta.json") as f:
        manifest = json.load(f)
    with np.load(path / "replicated.npz") as rep:
        replicated = {k: rep[k] for k in rep.files}

    # Per leaf: ordered [(start, stop, file)] covering the global axis.
    slabs = {}
    for p_str, ranges in manifest["ranges"].items():
        for name, (start, stop) in ranges.items():
            slabs.setdefault(name, []).append(
                (start, stop, path / f"shard_{p_str}" / (name + ".npy"))
            )
    for name in slabs:
        slabs[name].sort()

    def build(name):
        info = manifest["leaves"][name]
        shape = tuple(info["shape"])
        ax = info["axis"]
        if ax is None:
            return jnp.asarray(replicated[name])
        spec = [None] * len(shape)
        spec[ax] = axis_name
        sharding = NamedSharding(mesh, P(*spec))

        def cb(index):
            sl = index[ax]
            lo = sl.start or 0
            hi = sl.stop if sl.stop is not None else shape[ax]
            parts = []
            for start, stop, file in slabs[name]:
                o_lo, o_hi = max(lo, start), min(hi, stop)
                if o_lo >= o_hi:
                    continue
                arr = np.load(file, mmap_mode="r")
                idx = list(index)
                idx[ax] = slice(o_lo - start, o_hi - start)
                parts.append(np.asarray(arr[tuple(idx)]))
            out = np.concatenate(parts, axis=ax) if len(parts) > 1 else parts[0]
            return out

        return jax.make_array_from_callback(shape, sharding, cb)

    names = set(manifest["leaves"])

    def get(name):
        return build(name) if name in names else None

    hist = History(
        u=get("hist.u"), x=get("hist.x"), logl=get("hist.logl"),
        mis_c=get("hist.mis_c"),
        blobs=get("hist.blobs") if manifest["has_blobs"] else None,
        beta=get("hist.beta"), logz=get("hist.logz"), ess=get("hist.ess"),
        cv=get("hist.cv"), acceptance=get("hist.acceptance"),
        efficiency=get("hist.efficiency"), steps=get("hist.steps"),
        calls=get("hist.calls"), t=get("hist.t"),
    )
    cur = Current(
        u=get("cur.u"), x=get("cur.x"), logl=get("cur.logl"),
        blobs=get("cur.blobs") if manifest["has_blobs"] else None,
        assignments=get("cur.assignments"), beta=get("cur.beta"),
        logz=get("cur.logz"), ess=get("cur.ess"), cv=get("cur.cv"),
        acceptance=get("cur.acceptance"), efficiency=get("cur.efficiency"),
        steps=get("cur.steps"), calls=get("cur.calls"), iteration=get("cur.iteration"),
    )
    key = jnp.asarray(replicated["rng_key"])
    return hist, cur, key, manifest["meta"]
