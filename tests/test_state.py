"""History buffer + MIS weight computation tests.

Ports the analytic MIS checks of reference tests/test_state_manager.py:197-283
to the masked fixed-shape History, plus growth/commit behavior."""

import jax.numpy as jnp
import numpy as np

from tempest_tpu.state import (
    Current,
    History,
    commit,
    compute_logw_and_logz,
    grow_history,
    make_current,
    make_history,
)


def _np_reference_logw(logl_iters, betas, logzs, beta_final):
    """Direct NumPy transcription of the MIS balance-heuristic formula
    (reference state_manager.py:418-480) for validation."""
    logl_all = np.concatenate(logl_iters)
    n_per = np.array([len(l) for l in logl_iters])
    N = n_per.sum()
    A = beta_final * logl_all
    b = logl_all[:, None] * np.array(betas)[None, :] - np.array(logzs)[None, :]
    b = b + (np.log(n_per) - np.log(N))[None, :]
    B = np.logaddexp.reduce(b, axis=1)
    logw = A - B
    logz = np.logaddexp.reduce(logw) - np.log(len(logw))
    logw_norm = logw - np.logaddexp.reduce(logw)
    return logw_norm, logz


def _fill_history(logl_iters, betas, logzs, capacity=None, n_dim=2):
    T = len(logl_iters)
    N = len(logl_iters[0])
    cap = capacity or T
    hist = make_history(cap, N, n_dim)
    cur = make_current(N, n_dim)
    rng = np.random.default_rng(0)
    for t in range(T):
        cur = cur.replace(
            u=jnp.asarray(rng.uniform(size=(N, n_dim)), dtype=jnp.float32),
            x=jnp.asarray(rng.uniform(size=(N, n_dim)), dtype=jnp.float32),
            logl=jnp.asarray(logl_iters[t], dtype=jnp.float32),
            beta=jnp.asarray(betas[t], dtype=jnp.float32),
            logz=jnp.asarray(logzs[t], dtype=jnp.float32),
        )
        hist = commit(hist, cur)
    return hist


class TestCommitAndMasks:
    def test_commit_increments_t(self):
        hist = _fill_history([np.zeros(4)], [0.0], [0.0], capacity=8)
        assert int(hist.t) == 1
        assert hist.iter_mask().sum() == 1
        assert hist.sample_mask().sum() == 4

    def test_commit_stores_values(self):
        logl = np.array([-1.0, -2.0, -3.0])
        hist = _fill_history([logl], [0.5], [-0.25], capacity=4)
        np.testing.assert_allclose(np.array(hist.logl[0]), logl, rtol=1e-6)
        assert float(hist.beta[0]) == 0.5
        assert float(hist.logz[0]) == -0.25

    def test_grow_preserves(self):
        logl = np.array([-1.0, -2.0])
        hist = _fill_history([logl], [0.3], [0.1], capacity=2)
        grown = grow_history(hist, 8)
        assert grown.capacity == 8
        assert int(grown.t) == 1
        np.testing.assert_allclose(np.array(grown.logl[0]), logl, rtol=1e-6)
        # new logl slots are -inf (never valid weight)
        assert np.all(np.isneginf(np.array(grown.logl[4])))


class TestMISWeights:
    def test_empty_history(self):
        hist = make_history(4, 8, 2)
        logw, logz = compute_logw_and_logz(hist, 1.0)
        assert float(logz) == -np.inf

    def test_single_iteration_beta0(self):
        # One warmup iteration at beta=0, logz=0: logw_s = beta_f * logl_s
        logl = np.array([-1.0, -2.0, -0.5, -4.0])
        hist = _fill_history([logl], [0.0], [0.0], capacity=4)
        for beta_f in (0.0, 0.3, 1.0):
            logw, logz = compute_logw_and_logz(hist, beta_f)
            ref_logw, ref_logz = _np_reference_logw([logl], [0.0], [0.0], beta_f)
            valid = np.array(hist.sample_mask())
            np.testing.assert_allclose(np.array(logw)[valid], ref_logw, rtol=1e-5, atol=1e-6)
            assert np.isclose(float(logz), ref_logz, rtol=1e-5)

    def test_multiple_iterations_match_reference_formula(self):
        rng = np.random.default_rng(42)
        logl_iters = [rng.normal(-5, 2, size=16) for _ in range(3)]
        betas = [0.0, 0.2, 0.7]
        logzs = [0.0, -0.5, -1.2]
        hist = _fill_history(logl_iters, betas, logzs, capacity=5)
        for beta_f in (0.7, 0.85, 1.0):
            logw, logz = compute_logw_and_logz(hist, beta_f)
            ref_logw, ref_logz = _np_reference_logw(logl_iters, betas, logzs, beta_f)
            valid = np.array(hist.sample_mask())
            np.testing.assert_allclose(np.array(logw)[valid], ref_logw, rtol=1e-4, atol=1e-4)
            assert np.isclose(float(logz), ref_logz, rtol=1e-4, atol=1e-4)

    def test_padding_invariance(self):
        """Weights must not depend on unused capacity."""
        rng = np.random.default_rng(1)
        logl_iters = [rng.normal(-3, 1, size=8) for _ in range(2)]
        betas, logzs = [0.0, 0.4], [0.0, -0.3]
        h_small = _fill_history(logl_iters, betas, logzs, capacity=2)
        h_big = _fill_history(logl_iters, betas, logzs, capacity=16)
        lw_s, lz_s = compute_logw_and_logz(h_small, 1.0)
        lw_b, lz_b = compute_logw_and_logz(h_big, 1.0)
        assert np.isclose(float(lz_s), float(lz_b), rtol=1e-5)
        vs = np.array(h_small.sample_mask())
        vb = np.array(h_big.sample_mask())
        np.testing.assert_allclose(
            np.array(lw_s)[vs], np.array(lw_b)[vb], rtol=1e-5, atol=1e-6
        )

    def test_normalized_weights_sum_to_one(self):
        rng = np.random.default_rng(2)
        logl_iters = [rng.normal(-10, 3, size=32) for _ in range(4)]
        betas = [0.0, 0.1, 0.5, 0.9]
        logzs = [0.0, -1.0, -2.0, -2.5]
        hist = _fill_history(logl_iters, betas, logzs, capacity=8)
        logw, _ = compute_logw_and_logz(hist, 1.0, normalize=True)
        assert np.isclose(float(jnp.sum(jnp.exp(logw))), 1.0, rtol=1e-5)


class TestIncrementalDenominator:
    def test_matches_exact_formulation(self):
        """The commit-maintained accumulator reproduces the reference's
        full-matrix denominator (state_manager.py:466-471) exactly."""
        from tempest_tpu.state import mis_denominator, mis_denominator_exact

        rng = np.random.default_rng(5)
        hist = make_history(6, 16, 2)
        cur = make_current(16, 2)
        for t in range(4):
            u = jnp.asarray(rng.uniform(0, 1, (16, 2)), jnp.float32)
            logl = jnp.asarray(rng.normal(-4.0, 2.0, 16), jnp.float32)
            cur = cur.replace(
                u=u, x=u, logl=logl,
                beta=jnp.asarray(0.25 * t, jnp.float32),
                logz=jnp.asarray(-0.3 * t, jnp.float32),
            )
            hist = commit(hist, cur)
            inc = np.asarray(mis_denominator(hist))
            exact = np.asarray(mis_denominator_exact(hist))
            valid = np.asarray(hist.sample_mask())
            np.testing.assert_allclose(inc[valid], exact[valid], rtol=2e-5, atol=2e-5)

    def test_rebuild_matches_commit_maintained(self):
        from tempest_tpu.state import rebuild_mis_c

        rng = np.random.default_rng(9)
        hist = make_history(4, 8, 2)
        cur = make_current(8, 2)
        for t in range(3):
            cur = cur.replace(
                u=jnp.asarray(rng.uniform(0, 1, (8, 2)), jnp.float32),
                x=jnp.zeros((8, 2), jnp.float32),
                logl=jnp.asarray(rng.normal(-2, 1, 8), jnp.float32),
                beta=jnp.asarray(0.3 * t, jnp.float32),
                logz=jnp.asarray(-0.1 * t, jnp.float32),
            )
            hist = commit(hist, cur)
        rebuilt = rebuild_mis_c(hist)
        valid = np.asarray(hist.iter_mask())
        np.testing.assert_allclose(
            np.asarray(hist.mis_c)[valid],
            np.asarray(rebuilt.mis_c)[valid],
            rtol=2e-5, atol=2e-5,
        )


class TestGrowthAndAccumulator:
    def test_accumulator_survives_growth(self):
        # grow_history must preserve mis_c so subsequent weights match a
        # from-scratch rebuild.
        from tempest_tpu.state import mis_denominator, mis_denominator_exact

        rng = np.random.default_rng(3)
        logl_iters = [rng.normal(-5, 2, 8) for _ in range(3)]
        betas, logzs = [0.0, 0.2, 0.6], [0.0, -0.4, -1.1]
        hist = _fill_history(logl_iters, betas, logzs, capacity=4)
        hist = grow_history(hist, 16)
        # commit one more iteration after growth
        cur = make_current(8, 2).replace(
            logl=jnp.asarray(rng.normal(-4, 1, 8), jnp.float32),
            beta=jnp.asarray(0.9, jnp.float32),
            logz=jnp.asarray(-1.5, jnp.float32),
        )
        hist = commit(hist, cur)
        d_inc = np.asarray(mis_denominator(hist))
        d_exact = np.asarray(mis_denominator_exact(hist))
        valid = np.asarray(hist.sample_mask())
        np.testing.assert_allclose(d_inc[valid], d_exact[valid], rtol=2e-5, atol=2e-5)

    def test_infinite_logl_masked_not_nan(self):
        # -inf log-likelihoods must never produce NaNs in the weight math
        # (0 * inf guard in state._mis_c_after_commit / mis_denominator_exact).
        logl = np.array([-1.0, -2.0, -np.inf, -3.0])
        hist = _fill_history([logl], [0.5], [-0.2])
        logw, logz = compute_logw_and_logz(hist, 1.0)
        logw = np.asarray(logw)[np.asarray(hist.sample_mask())]
        assert not np.any(np.isnan(logw))
        assert np.isfinite(logz)
        assert logw[2] == -np.inf  # the infinite-logl sample carries no weight


class TestHostFetch:
    def test_fetch_passthrough_single_process(self):
        from tempest_tpu.utils.host import fetch, fetch_tree, is_primary, sync

        a = jnp.arange(6.0).reshape(2, 3)
        out = fetch(a)
        assert isinstance(out, np.ndarray)
        np.testing.assert_array_equal(out, np.arange(6.0).reshape(2, 3))
        tree = {"x": a, "n": None}
        t2 = fetch_tree(tree)
        assert t2["n"] is None and isinstance(t2["x"], np.ndarray)
        assert is_primary()
        sync("test")  # no-op single-process
