"""Posterior extraction options + evidence accuracy.

Mirrors the reference's tests/test_posterior_evidence.py: every posterior()
keyword combination, trimming semantics, resample output contract, logw
consistency with evidence, and results() contents.
"""

import numpy as np
import jax.numpy as jnp

from tempest_tpu import Sampler

N_DIM = 2
TRUE_LOGZ = -N_DIM * np.log(10.0)


def prior_transform(u):
    return -5.0 + 10.0 * u


def log_likelihood(x):
    return -0.5 * jnp.sum(x**2) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)


def _run(seed=0, **kw):
    defaults = dict(n_dim=N_DIM, n_particles=128, clustering=False, random_state=seed)
    defaults.update(kw)
    s = Sampler(prior_transform, log_likelihood, **defaults)
    s.run(n_total=512, progress=False)
    return s


class TestPosteriorOptions:
    def test_default_tuple_shape(self):
        s = _run()
        out = s.posterior()
        assert len(out) == 3
        x, w, logl = out
        assert x.shape[1] == N_DIM
        assert w.shape == logl.shape == (x.shape[0],)
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)

    def test_trim_off_keeps_all_history(self):
        s = _run()
        x_trim, _, _ = s.posterior(trim_importance_weights=True)
        x_all, w_all, _ = s.posterior(trim_importance_weights=False)
        n_hist = int(s.state.hist.t) * s.n_particles
        assert x_all.shape[0] == n_hist
        assert x_trim.shape[0] <= n_hist
        np.testing.assert_allclose(w_all.sum(), 1.0, rtol=1e-5)

    def test_trim_preserves_ess_fraction(self):
        from tempest_tpu.ops.tools import effective_sample_size

        s = _run()
        _, w_all, _ = s.posterior(trim_importance_weights=False)
        _, w_trim, _ = s.posterior(trim_importance_weights=True, ess_trim=0.99)
        ess_all = float(effective_sample_size(jnp.asarray(w_all)))
        ess_trim = float(effective_sample_size(jnp.asarray(w_trim)))
        assert ess_trim >= 0.98 * ess_all

    def test_resample_gives_uniform_weights(self):
        s = _run()
        x, w, logl = s.posterior(resample=True)
        assert np.allclose(w, 1.0 / len(w))

    def test_return_logw_consistent_with_weights(self):
        s = _run()
        x, w, logl, logw = s.posterior(return_logw=True)
        w2 = np.exp(logw - logw.max())
        w2 /= w2.sum()
        np.testing.assert_allclose(w2, w / w.sum(), rtol=1e-4, atol=1e-8)

    def test_option_combination_resample_logw(self):
        s = _run()
        out = s.posterior(resample=True, return_logw=True)
        assert len(out) == 4

    def test_moments_insensitive_to_trim(self):
        s = _run()
        x1, w1, _ = s.posterior(trim_importance_weights=False)
        x2, w2, _ = s.posterior(trim_importance_weights=True)
        m1 = np.average(x1, axis=0, weights=w1)
        m2 = np.average(x2, axis=0, weights=w2)
        np.testing.assert_allclose(m1, m2, atol=0.05)


class TestEvidence:
    def test_evidence_close_to_analytic(self):
        s = _run()
        logz, err = s.evidence()
        assert err is None
        assert abs(logz - TRUE_LOGZ) < 0.5

    def test_evidence_stable_across_seeds(self):
        vals = [_run(seed=k).evidence()[0] for k in range(3)]
        assert np.std(vals) < 0.5
        assert abs(np.mean(vals) - TRUE_LOGZ) < 0.5

    def test_logz_history_monotone_info(self):
        """Per-iteration logz estimates recorded and finite after warm-up."""
        s = _run()
        logz = s.results()["logz"]
        assert np.all(np.isfinite(logz[1:]))


class TestResults:
    def test_results_keys_and_lengths(self):
        s = _run()
        res = s.results()
        t = int(s.state.hist.t)
        for key in (
            "u", "x", "logl", "beta", "logz", "ess", "cv",
            "acceptance", "efficiency", "steps", "calls", "iter",
        ):
            assert key in res, key
            assert len(res[key]) == t, key
        assert res["iter"][0] == 1 and res["iter"][-1] == t
        assert res["logw"].shape == (t * s.n_particles,)

    def test_calls_cumulative_nondecreasing(self):
        s = _run()
        calls = s.results()["calls"]
        assert np.all(np.diff(calls) >= 0)
        assert s.calls == calls[-1]

    def test_beta_ends_at_one(self):
        s = _run()
        assert s.results()["beta"][-1] == 1.0


class TestBootstrapEvidenceError:
    """state.bootstrap_logz_err — the error bar the reference lacks
    (its evidence() returns logz_err=None unconditionally)."""

    def test_default_is_reference_behavior(self):
        s = _run()
        logz, err = s.evidence()
        assert err is None  # exact parity: core.py:244-247

    def test_bootstrap_err_finite_positive_and_conservative(self):
        logzs, errs = [], []
        for seed in range(3):
            s = _run(seed=seed)
            logz, err = s.evidence(n_bootstrap=128)
            assert np.isfinite(err) and err > 0
            logzs.append(logz)
            errs.append(err)
        scatter = float(np.std(logzs))
        # The block bootstrap is a conservative bound on the replication
        # scatter (it treats the systematic ladder profile as random):
        # every analytic deviation and the seed scatter must sit inside it.
        assert min(errs) >= 0.3 * scatter
        for lz, e in zip(logzs, errs):
            assert abs(lz - TRUE_LOGZ) < 4 * e

    def test_bootstrap_reproducible_scale(self):
        s = _run()
        _, e1 = s.evidence(n_bootstrap=256)
        _, e2 = s.evidence(n_bootstrap=256)
        # different RNG draws, same history: same scale
        assert abs(e1 - e2) < 0.5 * max(e1, e2)


class TestPosteriorCombinationMatrix:
    """Full keyword-combination coverage mirroring the breadth of the
    reference's tests/test_posterior_evidence.py:40-117."""

    def test_all_flag_combinations_contract(self):
        def ll_blob(x):
            return -0.5 * jnp.sum(x**2), jnp.sum(x)

        s = Sampler(
            prior_transform, ll_blob, n_dim=N_DIM, n_particles=128,
            clustering=False, random_state=1,
        )
        s.run(n_total=512, progress=False)
        for resample in (False, True):
            for trim in (False, True):
                for blobs in (False, True):
                    for logw in (False, True):
                        out = s.posterior(
                            resample=resample,
                            trim_importance_weights=trim,
                            return_blobs=blobs,
                            return_logw=logw,
                        )
                        expect = 3 + int(blobs) + int(logw)
                        assert len(out) == expect, (resample, trim, blobs, logw)
                        x, w = out[0], out[1]
                        n = x.shape[0]
                        assert w.shape == (n,)
                        assert np.all(w >= 0) and abs(w.sum() - 1.0) < 1e-5
                        if blobs:
                            assert out[3].shape[0] == n
                        if logw:
                            assert out[-1].shape == (n,)
                        if resample:
                            np.testing.assert_allclose(w, 1.0 / n, rtol=1e-6)

    def test_posterior_samples_within_prior_support(self):
        s = _run()
        x, w, _ = s.posterior()
        assert np.all(x >= -5.0) and np.all(x <= 5.0)

    def test_custom_trim_parameters(self):
        s = _run()
        x_loose, w_loose, _ = s.posterior(ess_trim=0.90, bins_trim=100)
        x_tight, w_tight, _ = s.posterior(ess_trim=0.999, bins_trim=2000)
        # looser ESS preservation can only drop more samples
        assert x_loose.shape[0] <= x_tight.shape[0]
        for w in (w_loose, w_tight):
            assert abs(w.sum() - 1.0) < 1e-5

    def test_resample_draws_from_trimmed_set(self):
        s = _run()
        x_base, _, _ = s.posterior(resample=False)
        x_res, w_res, _ = s.posterior(resample=True)
        base_set = {tuple(np.round(r, 6)) for r in x_base}
        for r in x_res[:64]:
            assert tuple(np.round(r, 6)) in base_set
