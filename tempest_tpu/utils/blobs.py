"""Blob schema: the bridge between user-facing blob semantics and the
device-resident numeric blob buffers.

Parity target: /root/reference/tempest/core.py:328-354. The reference packs
the per-point trailing return values `item[1:]` into a numpy array of
`blobs_dtype` (a simple dtype, a structured dtype, or — for strings and
ragged payloads — object), squeezing singleton axes. Its history stores
those numpy arrays directly.

On TPU the history lives on-device, so blobs are stored as a flat numeric
(B, T, N) buffer (state.History.blobs) and this module translates:

- **simple numeric dtypes**: fields flattened to B numeric slots; unpack
  restores the dtype and the reference's squeeze (a width-1 blob comes
  back as shape (n,), not (n, 1));
- **structured dtypes** (``[("f", float), ("v", float, (2,))]`` or any
  ``np.dtype`` with fields): each field occupies a slice of the B slots in
  a common numeric dtype; unpack reassembles a structured array with the
  original field dtypes;
- **object/string dtypes** (host likelihoods only): payloads stay in a
  host-side store and the device buffer carries int32 ids — resampling and
  MCMC accept/reject shuffle ids like any other numeric lane; unpack maps
  ids back to payloads in an object array.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _as_np_dtype(blobs_dtype) -> np.dtype:
    """Normalize the user's blobs_dtype spec, promoting strings to object
    (core.py:341-344: 'Strings need to be object arrays')."""
    dt = np.dtype(blobs_dtype)
    if dt.kind in "US":
        dt = np.dtype("object")
    return dt


class BlobSchema:
    """Layout of one point's blob in the device buffer."""

    def __init__(self, np_dtype: np.dtype, blob_size: Optional[int] = None):
        self.np_dtype = _as_np_dtype(np_dtype)
        self.is_object = self.np_dtype == np.dtype("object")
        self.is_struct = self.np_dtype.fields is not None
        self.store: List[Any] = []  # host payloads for object blobs

        if self.is_object:
            self.width = 1
            self.device_dtype = jnp.int32
            self.fields = None
        elif self.is_struct:
            fields = []
            offset = 0
            for name in self.np_dtype.names:
                fdt, _ = self.np_dtype.fields[name][:2]
                base, shape = fdt.base, fdt.shape
                n = int(np.prod(shape)) if shape else 1
                fields.append((name, base, shape, offset, n))
                offset += n
            self.fields = fields
            self.width = offset
            common = np.result_type(*[f[1] for f in fields])
            if common.kind not in "fiub":
                raise ValueError(
                    f"structured blobs_dtype with non-numeric field(s): {self.np_dtype}"
                )
            import jax as _jax

            if not _jax.config.jax_enable_x64:
                # 64-bit packing would be silently truncated device-side
                # anyway; choose the dtype explicitly to avoid warnings.
                common = {np.dtype("float64"): np.dtype("float32"),
                          np.dtype("int64"): np.dtype("int32")}.get(common, common)
            self.device_dtype = jnp.dtype(common)
        else:
            if blob_size is None:
                raise ValueError("blob_size required for simple numeric blobs_dtype")
            self.width = int(blob_size)
            self.fields = None
            self.device_dtype = jnp.dtype(self.np_dtype)

    # ------------------------------------------------------------------
    def pack(self, blob_items: Sequence[Any]) -> np.ndarray:
        """Per-point blob payloads -> (n, width) numeric device rows.

        `blob_items[i]` is the tuple of trailing return values of point i
        (reference `item[1:]`), or a single array/scalar.
        """
        n = len(blob_items)
        if self.is_object:
            base = len(self.store)
            for item in blob_items:
                # single trailing element unwraps, like np.array(blob) on a
                # list of 1-tuples squeezing the axis
                self.store.append(item[0] if isinstance(item, tuple) and len(item) == 1 else item)
            return np.arange(base, base + n, dtype=np.int32).reshape(n, 1)
        if self.is_struct:
            out = np.empty((n, self.width), dtype=np.dtype(str(self.device_dtype)))
            rec = np.array(
                [tuple(np.atleast_1d(it)) if not isinstance(it, tuple) else it for it in blob_items],
                dtype=self.np_dtype,
            )
            for name, base, shape, off, cnt in self.fields:
                out[:, off : off + cnt] = rec[name].reshape(n, cnt)
            return out
        arr = np.array(
            [np.atleast_1d(np.asarray(it, dtype=self.np_dtype)).reshape(-1) for it in blob_items],
            dtype=self.np_dtype,
        )
        return arr.reshape(n, self.width)

    # ------------------------------------------------------------------
    def unpack(self, flat: np.ndarray) -> np.ndarray:
        """(n, width) device rows -> user-facing blob array.

        Reproduces the reference's squeeze: a width-1 simple blob returns
        shape (n,); structured dtypes return a (n,) structured array with
        per-field shapes; object blobs return an (n,) object array.
        """
        flat = np.asarray(flat)
        n = flat.shape[0]
        if self.is_object:
            ids = flat.reshape(n).astype(np.int64)
            out = np.empty((n,), dtype=object)
            for i, j in enumerate(ids):
                out[i] = self.store[j] if 0 <= j < len(self.store) else None
            return out
        if self.is_struct:
            rec = np.zeros((n,), dtype=self.np_dtype)
            for name, base, shape, off, cnt in self.fields:
                vals = flat[:, off : off + cnt].astype(base)
                rec[name] = vals.reshape((n,) + shape) if shape else vals.reshape(n)
            return rec
        out = flat.astype(self.np_dtype)
        if self.width == 1:
            return out.reshape(n)
        return out

    # ------------------------------------------------------------------
    def prune_store(self, live_ids: np.ndarray) -> None:
        """Drop unreferenced object payloads (rejected MCMC proposals).

        Keeps ids stable by replacing dead entries with None rather than
        renumbering.
        """
        if not self.is_object or not self.store:
            return
        live = set(int(i) for i in np.asarray(live_ids).reshape(-1) if i >= 0)
        for i in range(len(self.store)):
            if i not in live:
                self.store[i] = None


def infer_np_dtype_from_result(blob_item) -> np.dtype:
    """Auto-detect the blob dtype from one result's trailing values.

    Parity: core.py:336-345 — np.atleast_1d(blob).dtype with string/ragged
    payloads promoted to object.
    """
    try:
        dt = np.atleast_1d(blob_item).dtype
    except ValueError:
        return np.dtype("object")
    if dt.kind in "US" or dt == np.dtype("object"):
        return np.dtype("object")
    return dt
