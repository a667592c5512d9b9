"""Backward compatibility: format-v1 checkpoints still load and resume.

The committed fixture tests/fixtures/v1_checkpoint.state was written in the
round-1 (v1) encoding — (T, N, d) coordinate layout, no `hist.mis_c`
accumulator, raw (non-sweep) call counters, no `format_version` key — by
tests/fixtures/make_v1_checkpoint.py. The loader must migrate all three
differences (utils/checkpoint.py:113-165, state.py rebuild_mis_c).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tempest_tpu import Sampler
from tempest_tpu.state import mis_denominator, mis_denominator_exact
from tempest_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "v1_checkpoint.state")


def _prior(u):
    return -10.0 + 20.0 * u


def _loglike(x):
    return -0.5 * jnp.sum(x * x, axis=-1)


def _make_sampler():
    return Sampler(
        _prior, _loglike, n_dim=3, n_particles=32, vectorize=True,
        clustering=False, random_state=7, history_capacity=24,
    )


class TestV1CheckpointLoad:
    def test_fixture_loads_and_migrates(self):
        hist, cur, key, meta, store = load_checkpoint(FIXTURE)
        # Layout migrated: (d, T, N) with the fixture's recorded shapes.
        assert hist.u.shape == (3, 24, 32)
        assert hist.x.shape == (3, 24, 32)
        assert int(hist.t) == 6
        assert store is None
        assert meta["n_total"] == 128
        # Call counters migrated from raw counts to sweep units: every raw
        # count in the v1 file was a multiple of n_particles, so the
        # migrated sweep counts must be positive and far below the raw
        # values (6 warm/mutate iterations => < 1000 sweeps).
        assert int(cur.calls) > 0
        assert int(cur.calls) < 1000
        assert np.all(np.asarray(hist.calls[:6]) > 0)

    def test_mis_accumulator_rebuilt(self):
        hist, *_ = load_checkpoint(FIXTURE)
        # The v1 file has no mis_c; the loader must rebuild it to match the
        # exact O(S*T) reference formulation.
        got = np.asarray(mis_denominator(hist))
        want = np.asarray(mis_denominator_exact(hist))
        valid = np.asarray(hist.sample_mask())
        np.testing.assert_allclose(got[valid], want[valid], rtol=1e-5, atol=1e-5)

    def test_resume_matches_v2_roundtrip(self, tmp_path):
        """Resuming from the v1 file must land in the same state as
        resuming from the same state re-saved in the current format, and
        the continued run must produce identical evidence."""
        # Re-encode the migrated state as a v2 checkpoint.
        hist, cur, key, meta, _ = load_checkpoint(FIXTURE)
        v2_path = tmp_path / "v2.state"
        save_checkpoint(v2_path, hist, cur, key, meta)

        results = []
        for path in (FIXTURE, str(v2_path)):
            s = _make_sampler()
            s.run(n_total=128, progress=False, resume_state_path=path)
            results.append(s)

        s1, s2 = results
        assert int(s1.state.hist.t) == int(s2.state.hist.t)
        b1 = np.asarray(s1.state.hist.beta)[: int(s1.state.hist.t)]
        b2 = np.asarray(s2.state.hist.beta)[: int(s2.state.hist.t)]
        np.testing.assert_array_equal(b1, b2)
        assert float(s1.logz) == float(s2.logz)
        # The resumed run completes the annealing from the fixture's state.
        assert float(s1.beta) == 1.0
        assert np.isfinite(float(s1.logz))

    def test_resume_continues_iteration_counter(self):
        s = _make_sampler()
        s.run(n_total=128, progress=False, resume_state_path=FIXTURE)
        # Fixture was written at t=6; resume must not restart from zero.
        assert int(s.state.hist.t) > 6
        assert int(s.state.cur.iteration) > 6
