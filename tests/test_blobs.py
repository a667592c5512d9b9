"""Blob semantics parity tests.

Mirrors the reference's blob handling (/root/reference/tempest/core.py:
328-354 and tests/test_sampler_features.py blob cases): auto-detection from
the result shape, declared simple dtypes with squeeze semantics, structured
dtypes with named fields and per-field shapes, string -> object promotion,
and multiple trailing return values packed in order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tempest_tpu import Sampler
from tempest_tpu.utils.blobs import BlobSchema, infer_np_dtype_from_result


def prior(u):
    return 10.0 * u - 5.0


def run_small(s, n_total=64):
    s.run(n_total=n_total, progress=False)
    return s


class TestBlobSchema:
    def test_simple_width1_squeezes(self):
        sch = BlobSchema(np.float32, blob_size=1)
        flat = sch.pack([(1.5,), (2.5,)])
        assert flat.shape == (2, 1)
        out = sch.unpack(flat)
        assert out.shape == (2,)  # reference squeeze (core.py:348-353)
        np.testing.assert_allclose(out, [1.5, 2.5])

    def test_simple_vector_blob(self):
        sch = BlobSchema(np.float64, blob_size=3)
        flat = sch.pack([(np.arange(3.0),), (np.arange(3.0) + 1,)])
        out = sch.unpack(flat)
        assert out.shape == (2, 3) and out.dtype == np.float64

    def test_structured_fields_roundtrip(self):
        dt = np.dtype([("chi2", np.float32), ("vec", np.float32, (2,))])
        sch = BlobSchema(dt)
        assert sch.width == 3
        flat = sch.pack([(1.0, np.array([2.0, 3.0])), (4.0, np.array([5.0, 6.0]))])
        rec = sch.unpack(flat)
        assert rec.dtype == dt and rec.shape == (2,)
        np.testing.assert_allclose(rec["chi2"], [1.0, 4.0])
        np.testing.assert_allclose(rec["vec"][1], [5.0, 6.0])

    def test_string_dtype_promotes_to_object(self):
        # core.py:341-344 — strings risk truncation as fixed-width arrays
        sch = BlobSchema("U8")
        assert sch.is_object
        flat = sch.pack([("abc",), ("defghijklmnop",)])  # longer than U8
        out = sch.unpack(flat)
        assert out.dtype == object
        assert list(out) == ["abc", "defghijklmnop"]  # no truncation

    def test_object_store_prune(self):
        sch = BlobSchema("object")
        flat = sch.pack([(i,) for i in range(5)])
        sch.prune_store(np.array([0, 3]))
        assert sch.store[0] == 0 and sch.store[3] == 3
        assert sch.store[1] is None and sch.store[4] is None

    def test_infer_dtype_from_result(self):
        assert infer_np_dtype_from_result(1.5) == np.float64
        assert infer_np_dtype_from_result("abc") == np.dtype("object")
        assert infer_np_dtype_from_result(np.float32(2.0)) == np.float32


class TestAutoDetection:
    def test_tuple_return_detected_without_dtype(self):
        """Reference detects blobs from the first result being a tuple
        (core.py:329); here jax.eval_shape does it at construction."""

        def ll(x):
            return -0.5 * jnp.sum(x * x), jnp.sum(x)

        s = run_small(Sampler(prior, ll, n_dim=2, n_particles=32, random_state=0))
        x, w, logl, blobs = s.posterior(return_blobs=True)
        assert blobs.shape == x.shape[:1]  # width-1 blob squeezed to (n,)
        np.testing.assert_allclose(blobs, x.sum(axis=1), rtol=1e-5)

    def test_multiple_trailing_values_packed_in_order(self):
        """item[1:] forms the blob (core.py:331)."""

        def ll(x):
            return -0.5 * jnp.sum(x * x), jnp.sum(x), jnp.max(x)

        s = run_small(Sampler(prior, ll, n_dim=2, n_particles=32, random_state=0))
        x, w, logl, blobs = s.posterior(return_blobs=True)
        assert blobs.shape == (x.shape[0], 2)
        np.testing.assert_allclose(blobs[:, 0], x.sum(axis=1), rtol=1e-5)
        np.testing.assert_allclose(blobs[:, 1], x.max(axis=1), rtol=1e-5)

    def test_no_blobs_unchanged(self):
        def ll(x):
            return -0.5 * jnp.sum(x * x)

        s = run_small(Sampler(prior, ll, n_dim=2, n_particles=32, random_state=0))
        assert s.state.blob_schema is None
        out = s.posterior(return_blobs=True)
        assert len(out) == 3  # no blob entry


class TestStructuredBlobs:
    def test_structured_run_and_results(self):
        def ll(x):
            return -0.5 * jnp.sum(x * x), jnp.sum(x), x * 2.0

        dt = [("s", np.float32), ("v", np.float32, (2,))]
        s = run_small(
            Sampler(prior, ll, n_dim=2, n_particles=32, blobs_dtype=dt, random_state=0)
        )
        x, w, logl, blobs = s.posterior(return_blobs=True)
        assert blobs.dtype == np.dtype(dt)
        np.testing.assert_allclose(blobs["s"], x.sum(axis=1), rtol=1e-5)
        np.testing.assert_allclose(blobs["v"], 2.0 * x, rtol=1e-5)
        r = s.results()
        assert r["blobs"].dtype == np.dtype(dt)
        assert r["blobs"].shape == (int(s.state.hist.t), 32)

    def test_mixed_field_dtypes(self):
        def ll(x):
            return -0.5 * jnp.sum(x * x), jnp.sum(x), jnp.asarray(3, jnp.int32)

        dt = [("a", np.float32), ("k", np.int32)]
        s = run_small(
            Sampler(prior, ll, n_dim=2, n_particles=32, blobs_dtype=dt, random_state=0)
        )
        x, w, logl, blobs = s.posterior(return_blobs=True)
        assert blobs["k"].dtype == np.int32
        assert np.all(blobs["k"] == 3)


class TestObjectBlobs:
    def _sampler(self, **kw):
        def ll(x):
            return (
                -0.5 * float(np.sum(x * x)),
                {"tag": round(float(x[0]), 3)},  # arbitrary Python payload
            )

        return Sampler(
            prior, ll, n_dim=2, n_particles=16, host_likelihood=True,
            blobs_dtype="object", random_state=0, n_max_steps=3, **kw
        )

    def test_object_payloads_follow_particles(self):
        s = run_small(self._sampler(), n_total=32)
        x, w, logl, blobs = s.posterior(return_blobs=True)
        assert blobs.dtype == object
        # every payload matches its particle's first coordinate
        for xi, b in zip(x[:20], blobs[:20]):
            assert b is not None
            assert abs(b["tag"] - round(float(xi[0]), 3)) < 5e-3

    def test_object_store_checkpoint_roundtrip(self, tmp_path):
        s = run_small(self._sampler(), n_total=32)
        path = tmp_path / "obj.state"
        s.save_state(path)
        s2 = self._sampler()
        s2.load_state(path)
        x, w, logl, blobs = s2.posterior(return_blobs=True)
        assert blobs.dtype == object and blobs[0] is not None
