"""Sampler API + feature integration tests — ports of reference
tests/test_sampler.py, test_sampler_features.py, test_sample_method.py,
test_posterior_evidence.py, test_state.py behaviors on small problems."""

import numpy as np
import jax.numpy as jnp
import pytest

from tempest_tpu import Sampler

N_DIM = 2
LO, HI = -5.0, 5.0
TRUE_LOGZ = -N_DIM * np.log(HI - LO)


def prior_transform(u):
    return LO + (HI - LO) * u


def log_likelihood(x):
    return -0.5 * jnp.sum(x**2) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)


def make_sampler(**kw):
    defaults = dict(
        n_dim=N_DIM, n_particles=128, clustering=False, random_state=0
    )
    defaults.update(kw)
    return Sampler(prior_transform, log_likelihood, **defaults)


class TestBasicRun:
    def test_run_and_evidence(self):
        s = make_sampler()
        s.run(n_total=512, progress=False)
        logz, logz_err = s.evidence()
        assert logz_err is None
        assert abs(logz - TRUE_LOGZ) < 0.5
        assert s.beta == 1.0

    def test_posterior_moments(self):
        s = make_sampler()
        s.run(n_total=512, progress=False)
        x, w, logl = s.posterior()
        mean = np.average(x, axis=0, weights=w)
        var = np.average((x - mean) ** 2, axis=0, weights=w)
        np.testing.assert_allclose(mean, 0.0, atol=0.25)
        np.testing.assert_allclose(var, 1.0, atol=0.5)

    def test_posterior_resample(self):
        s = make_sampler()
        s.run(n_total=512, progress=False)
        x, w, logl = s.posterior(resample=True)
        assert np.allclose(w, w[0])  # uniform after resampling

    def test_posterior_return_logw(self):
        s = make_sampler()
        s.run(n_total=512, progress=False)
        out = s.posterior(return_logw=True)
        assert len(out) == 4
        x, w, logl, logw = out
        assert logw.shape == w.shape

    def test_properties(self):
        s = make_sampler(n_particles=64)
        assert s.n_dim == N_DIM
        assert s.n_particles == 64
        assert s.ess_ratio == 2.0
        assert s.clustering is False
        assert s.resample == "mult"

    def test_default_n_particles(self):
        s = Sampler(prior_transform, log_likelihood, n_dim=N_DIM)
        assert s.n_particles == 2 * N_DIM

    def test_results_dict(self):
        s = make_sampler()
        s.run(n_total=512, progress=False)
        r = s.results()
        t = len(r["beta"])
        assert t >= 2
        assert r["u"].shape == (t, 128, N_DIM)
        assert r["beta"][-1] == 1.0
        assert len(r["logw"]) == t * 128

    def test_run_on_device_matches_host_loop(self):
        s1 = make_sampler(random_state=3)
        s1.run(n_total=512, progress=False)
        s2 = make_sampler(random_state=3)
        s2.run(n_total=512, progress=False, on_device=True)
        assert abs(s1.evidence()[0] - s2.evidence()[0]) < 0.6
        assert s2.beta == 1.0


class TestHardwarePrngFallback:
    def test_cpu_falls_back_to_threefry_bit_exactly(self):
        """hardware_prng=True on a non-TPU backend must be a no-op: the
        gate (ops.pallas_prng.hw_prng_supported) fails on CPU, so the
        threefry path runs and results are bit-identical to flag-off."""
        from tempest_tpu.ops.pallas_prng import hw_prng_supported

        assert not hw_prng_supported(jnp.float32)  # conftest forces CPU
        s_off = make_sampler(random_state=11)
        s_off.run(n_total=256, progress=False)
        s_on = make_sampler(random_state=11, hardware_prng=True)
        s_on.run(n_total=256, progress=False)
        assert float(s_on.logz) == float(s_off.logz)
        assert int(s_on.state.hist.t) == int(s_off.state.hist.t)
        np.testing.assert_array_equal(
            np.asarray(s_on.state.cur.logl), np.asarray(s_off.state.cur.logl)
        )


class TestSamplerVariants:
    def test_rwm(self):
        s = make_sampler(sample="rwm")
        s.run(n_total=512, progress=False)
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.7

    def test_systematic_resample(self):
        s = make_sampler(resample="syst")
        s.run(n_total=512, progress=False)
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.5

    def test_clustering_on(self):
        s = make_sampler(clustering=True)
        s.run(n_total=512, progress=False)
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.5

    def test_vectorized_likelihood(self):
        def loglike_vec(x):
            return -0.5 * jnp.sum(x**2, axis=-1) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)

        s = Sampler(
            prior_transform, loglike_vec, n_dim=N_DIM, n_particles=128,
            vectorize=True, clustering=False, random_state=0,
        )
        s.run(n_total=512, progress=False)
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.5

    def test_likelihood_args_kwargs(self):
        def loglike(x, scale, offset=0.0):
            return -0.5 * jnp.sum(((x - offset) / scale) ** 2) - 0.5 * N_DIM * jnp.log(
                2 * jnp.pi * scale**2
            )

        s = Sampler(
            prior_transform, loglike, n_dim=N_DIM, n_particles=128,
            log_likelihood_args=[1.0], log_likelihood_kwargs={"offset": 0.0},
            clustering=False, random_state=0,
        )
        s.run(n_total=512, progress=False)
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.5

    def test_1d_problem(self):
        def pt(u):
            return LO + (HI - LO) * u

        def ll(x):
            return -0.5 * jnp.sum(x**2) - 0.5 * jnp.log(2 * jnp.pi)

        s = Sampler(pt, ll, n_dim=1, n_particles=64, clustering=False, random_state=0)
        s.run(n_total=256, progress=False)
        assert abs(s.evidence()[0] - (-np.log(HI - LO))) < 0.5

    def test_periodic(self):
        s = make_sampler(periodic=[0])
        s.run(n_total=256, progress=False)
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.7

    def test_reflective(self):
        s = make_sampler(reflective=[1])
        s.run(n_total=256, progress=False)
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.7

    def test_dynamic_mode(self):
        s = make_sampler(volume_variation=0.5, n_particles=64)
        s.run(n_total=256, progress=False)
        assert s.beta == 1.0
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 1.0

    def test_host_likelihood_callback(self):
        def np_loglike(x):
            return float(-0.5 * np.sum(x**2) - 0.5 * N_DIM * np.log(2 * np.pi))

        s = Sampler(
            prior_transform, np_loglike, n_dim=N_DIM, n_particles=128,
            host_likelihood=True, clustering=False, random_state=0,
        )
        s.run(n_total=512, progress=False)
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.5


class TestBlobs:
    def test_blobs_tracked(self):
        def loglike_blobs(x):
            logl = -0.5 * jnp.sum(x**2) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)
            return logl, jnp.sum(x)  # blob: derived quantity

        s = Sampler(
            prior_transform, loglike_blobs, n_dim=N_DIM, n_particles=64,
            blobs_dtype="float32", clustering=False, random_state=0,
        )
        s.run(n_total=256, progress=False)
        x, w, logl, blobs = s.posterior(return_blobs=True)
        # Reference squeeze semantics (core.py:348-353): a width-1 blob
        # comes back with shape (n,), not (n, 1).
        assert blobs.shape == (x.shape[0],)
        np.testing.assert_allclose(blobs, x.sum(axis=1), rtol=1e-3, atol=1e-3)


class TestSampleMethod:
    def test_manual_loop_matches_run(self):
        s = make_sampler()
        state = s.sample()
        assert state["iter"] == 1
        assert state["beta"] == 0.0
        for _ in range(40):
            state = s.sample()
            if 1.0 - state["beta"] < 1e-4 and state["ess"] >= 256:
                break
        assert state["beta"] == 1.0

    def test_sample_returns_state_dict(self):
        s = make_sampler()
        state = s.sample()
        for key in ("u", "x", "logl", "beta", "logz", "ess", "calls", "iter"):
            assert key in state
        assert state["u"].shape == (128, N_DIM)

    def test_sample_cannot_corrupt_internal_state(self):
        # The reference returns defensive copies (test_sample_method.py:
        # 125-147); here the returned numpy views are READ-ONLY (np.asarray
        # of a device array), which enforces the same contract harder:
        # callers cannot mutate internal state through the return value.
        s = make_sampler()
        st = s.sample()
        with pytest.raises(ValueError, match="read-only"):
            st["u"][:] = -1.0
        st2 = s.sample()
        assert (st2["u"] >= 0.0).all() and (st2["u"] <= 1.0).all()

    def test_sample_monotone_counters(self):
        # iter increments by one and calls never decreases across manual
        # steps (reference test_sample_method.py:148-207).
        s = make_sampler()
        prev_calls, prev_beta = 0, -1.0
        for k in range(1, 6):
            st = s.sample()
            assert st["iter"] == k
            assert st["calls"] >= prev_calls
            assert st["beta"] >= prev_beta
            prev_calls, prev_beta = st["calls"], st["beta"]

    def test_manual_loop_matches_run_logz(self):
        # Driving sample() by hand with the reference termination rule must
        # land on the same evidence as run() with the same seed
        # (test_sample_method.py:334-366 — run() IS the sample() loop).
        s_run = make_sampler(random_state=7)
        s_run.run(n_total=256, progress=False)

        s_man = make_sampler(random_state=7)
        for _ in range(200):
            st = s_man.sample()
            if 1.0 - st["beta"] < 1e-4:
                from tempest_tpu.ops.tools import ess_from_logw
                from tempest_tpu.state import compute_logw_and_logz

                logw, _ = compute_logw_and_logz(s_man.state.hist, 1.0)
                if float(ess_from_logw(logw)) >= 256:
                    break
        # Same final evidence recomputation as run()
        from tempest_tpu.state import compute_logw_and_logz

        _, logz_man = compute_logw_and_logz(s_man.state.hist, 1.0)
        assert int(s_man.state.hist.t) == int(s_run.state.hist.t)
        assert abs(float(logz_man) - s_run.logz) < 1e-5

    def test_sample_with_blobs(self):
        # Per-particle blob outputs flow through the manual-step API
        # (reference test_sample_method.py:267-302).
        def ll_blob(x):
            return -0.5 * jnp.sum(x**2), jnp.sum(x)

        s = Sampler(
            prior_transform,
            ll_blob,
            n_dim=N_DIM,
            n_particles=64,
            clustering=False,
            blobs_dtype="float32",
            random_state=0,
        )
        st = s.sample()
        assert st["blobs"] is not None
        # width-1 blobs are squeezed to (N,) — reference core.py:348-353
        assert st["blobs"].shape == (64,)
        np.testing.assert_allclose(st["blobs"], st["x"].sum(axis=1), rtol=1e-5)


class TestSaveLoad:
    def test_checkpoint_roundtrip(self, tmp_path):
        s = make_sampler()
        for _ in range(4):
            s.sample()
        path = tmp_path / "ckpt.state"
        s.save_state(path)

        s2 = make_sampler()
        s2.load_state(path)
        assert int(s2.state.hist.t) == int(s.state.hist.t)
        assert s2.beta == s.beta
        np.testing.assert_allclose(
            np.asarray(s2.state.cur.u), np.asarray(s.state.cur.u)
        )

    def test_resume_run(self, tmp_path):
        s = make_sampler()
        for _ in range(3):
            s.sample()
        path = tmp_path / "resume.state"
        s.save_state(path)

        s2 = make_sampler()
        s2.run(n_total=512, progress=False, resume_state_path=path)
        assert s2.beta == 1.0
        assert abs(s2.evidence()[0] - TRUE_LOGZ) < 0.6

    def test_save_every_writes_files(self, tmp_path):
        s = Sampler(
            prior_transform, log_likelihood, n_dim=N_DIM, n_particles=64,
            clustering=False, random_state=0, output_dir=str(tmp_path),
            output_label="t",
        )
        s.run(n_total=128, progress=False, save_every=2)
        assert (tmp_path / "t_final.state").exists()


class TestEdgeCases:
    def test_infinite_likelihood_patch(self):
        def loglike_partial(x):
            # -inf outside |x| < 4 (plateau likelihood support)
            inside = jnp.all(jnp.abs(x) < 4.0)
            val = -0.5 * jnp.sum(x**2) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)
            return jnp.where(inside, val, -jnp.inf)

        s = Sampler(
            prior_transform, loglike_partial, n_dim=N_DIM, n_particles=128,
            clustering=False, random_state=0,
        )
        s.run(n_total=256, progress=False)
        logz = s.evidence()[0]
        # support restriction removes negligible mass; logZ unchanged
        assert abs(logz - TRUE_LOGZ) < 0.6
        assert np.all(np.isfinite(np.asarray(s.state.cur.logl)))

    def test_narrow_likelihood(self):
        def narrow(x):
            return -0.5 * jnp.sum((x / 0.01) ** 2) - 0.5 * N_DIM * jnp.log(
                2 * jnp.pi * 0.01**2
            )

        s = Sampler(
            prior_transform, narrow, n_dim=N_DIM, n_particles=128,
            clustering=False, random_state=0,
        )
        s.run(n_total=256, progress=False)
        true = -N_DIM * np.log(HI - LO)
        assert abs(s.evidence()[0] - true) < 1.0

    def test_invalid_config_raises(self):
        with pytest.raises(ValueError):
            Sampler(prior_transform, log_likelihood, n_dim=N_DIM, sample="bogus")
        with pytest.raises(ValueError):
            Sampler(prior_transform, log_likelihood, n_dim=N_DIM, resample="bogus")
        with pytest.raises(ValueError):
            Sampler(
                prior_transform, log_likelihood, n_dim=N_DIM,
                periodic=[0], reflective=[0],
            )

    def test_history_growth(self):
        # Force capacity growth with a tiny initial capacity
        s = Sampler(
            prior_transform, log_likelihood, n_dim=N_DIM, n_particles=64,
            clustering=False, random_state=0, history_capacity=2,
        )
        s.run(n_total=256, progress=False)
        assert int(s.state.hist.t) > 2
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.6

    def test_auto_capacity_pregrows(self):
        # Default (no history_capacity given): run() pre-sizes the history
        # from n_total so a typical run never recompiles mid-flight.
        s = Sampler(
            prior_transform, log_likelihood, n_dim=N_DIM, n_particles=64,
            clustering=False, random_state=0,
        )
        assert s._core.config.auto_capacity
        s.run(n_total=256, progress=False)
        need = -(-256 // 64) + 40
        assert s.state.hist.capacity >= need
        assert int(s.state.hist.t) <= s.state.hist.capacity
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.6

    def test_explicit_capacity_not_pregrown(self):
        # An explicit history_capacity disables the auto pre-grow: the
        # buffer stays at the requested size unless the run actually
        # overflows it (geometric growth still applies then).
        s = Sampler(
            prior_transform, log_likelihood, n_dim=N_DIM, n_particles=64,
            clustering=False, random_state=0, history_capacity=32,
        )
        assert not s._core.config.auto_capacity
        s.run(n_total=128, progress=False)
        assert s.state.hist.capacity == 32


class TestPickling:
    def test_pickle_roundtrip_mid_run(self):
        import pickle

        s = make_sampler()
        for _ in range(5):
            s.sample()
        blob = pickle.dumps(s)
        s2 = pickle.loads(blob)
        assert s2.beta == s.beta
        assert int(s2.state.hist.t) == int(s.state.hist.t)
        # both continue identically (same RNG stream)
        a = s.sample()
        b = s2.sample()
        assert a["beta"] == b["beta"]
        np.testing.assert_allclose(a["logz"], b["logz"], rtol=1e-6)

    def test_pickle_then_finish_run(self):
        import pickle

        s = make_sampler()
        for _ in range(3):
            s.sample()
        s2 = pickle.loads(pickle.dumps(s))
        s2.run(n_total=512, progress=False)
        assert s2.beta == 1.0
        assert abs(s2.evidence()[0] - TRUE_LOGZ) < 0.5


class TestHostPool:
    def test_pool_object_map_is_used(self):
        calls = {"n": 0}

        class CountingPool:
            def map(self, f, xs):
                calls["n"] += 1
                return [f(x) for x in xs]

        def np_loglike(x):
            return float(-0.5 * np.sum(x**2) - 0.5 * N_DIM * np.log(2 * np.pi))

        s = Sampler(
            prior_transform, np_loglike, n_dim=N_DIM, n_particles=64,
            host_likelihood=True, pool=CountingPool(),
            clustering=False, random_state=0,
        )
        s.run(n_total=256, progress=False)
        assert calls["n"] > 0
        assert abs(s.evidence()[0] - TRUE_LOGZ) < 0.7
        assert s.beta == 1.0


class TestCallsCounter:
    """Regression: device call counters are kept in sweep units so the int32
    buffer cannot overflow on long runs (round-1 review, weak item 2)."""

    def _make(self):
        from tempest_tpu import Sampler

        return Sampler(
            lambda u: 2.0 * u - 1.0,
            lambda x: -0.5 * jnp.sum(x**2, axis=-1),
            n_dim=2,
            n_particles=1024,
            vectorize=True,
            clustering=False,
            random_state=0,
        )

    def test_large_sweep_count_reported_exactly(self):
        s = self._make()
        # 3e6 sweeps x 1024 particles = 3.07e9 raw calls > 2^31 - 1
        s.state.cur = s.state.cur.replace(calls=jnp.asarray(3_000_000, jnp.int32))
        assert s.calls == 3_000_000 * 1024
        assert s.calls > np.iinfo(np.int32).max

    def test_run_reports_multiple_of_n_particles(self):
        s = self._make()
        s.run(n_total=256, progress=False)
        assert s.calls > 0
        assert s.calls % 1024 == 0
        hist_calls = s.results()["calls"]
        assert hist_calls.dtype == np.int64
        assert s.calls == hist_calls[-1]


class TestClusterEvery:
    """cluster_every > 1 runs through the fused path with the fitted model
    carried between iterations (round-1 review, weak item 6)."""

    def test_cluster_every_3_fused(self):
        s = Sampler(
            lambda u: 20.0 * u - 10.0,
            lambda x: -0.5 * jnp.sum(x**2, axis=-1)
            - 0.5 * 4 * jnp.log(2 * jnp.pi),
            n_dim=4,
            n_particles=128,
            vectorize=True,
            clustering=True,
            cluster_every=3,
            random_state=3,
        )
        assert s.state._fused_iter is not None  # fused path, not host loop
        s.run(n_total=256, progress=False)
        assert s.beta == 1.0
        assert abs(s.logz - (-4 * np.log(20.0))) < 0.5
        # the carried model became a real fit at some point
        assert bool(s.state._fused_fitted)

    def test_fused_false_uses_host_loop(self):
        from tempest_tpu.config import SamplerConfig
        from tempest_tpu.core import SamplerCore

        cfg = SamplerConfig(
            prior_transform=lambda u: 2.0 * u - 1.0,
            log_likelihood=lambda x: -0.5 * jnp.sum(x**2, axis=-1),
            n_dim=2,
            n_particles=64,
            vectorize=True,
            clustering=False,
            random_state=0,
            fused=False,
        )
        core = SamplerCore(cfg)
        assert core._fused_iter is None
        core.run_sampling(n_total=128, progress=False)
        assert float(core.cur.beta) == 1.0


class TestCheckpointCompat:
    def test_legacy_raw_call_counts_converted(self, tmp_path):
        """Files from before the sweep-units change stored raw call counts;
        load_checkpoint must convert them (utils/checkpoint.py)."""
        import json

        s = make_sampler()
        for _ in range(3):
            s.sample()
        path = tmp_path / "new.state"
        s.save_state(path)
        sweeps = int(s.state.cur.calls)
        n = s.n_particles

        # Rewrite the file as a legacy checkpoint: raw counts, no marker.
        with np.load(path, allow_pickle=False) as data:
            arrays = {k: data[k] for k in data.files if k != "__meta__"}
            payload = json.loads(str(data["__meta__"]))
        del payload["calls_units"]
        arrays["cur.calls"] = arrays["cur.calls"] * n
        arrays["hist.calls"] = arrays["hist.calls"] * n
        legacy = tmp_path / "legacy.state"
        with open(legacy, "wb") as f:  # np.savez(path) would append .npz
            np.savez(f, __meta__=json.dumps(payload), **arrays)

        s2 = make_sampler()
        s2.load_state(legacy)
        assert int(s2.state.cur.calls) == sweeps  # back in sweep units
        assert s2.calls == sweeps * n  # raw count identical


class TestSampleMethodBreadth:
    """Manual sample()-loop breadth mirroring the reference's
    test_sample_method.py cases not already covered above: state shapes,
    save_every from sample(), per-method/per-kernel manual loops, and
    particle updates between steps."""

    def test_sample_state_shapes(self):
        s = make_sampler()
        st = s.sample()
        N, d = s.n_particles, s.n_dim
        assert st["u"].shape == (N, d) and st["x"].shape == (N, d)
        assert st["logl"].shape == (N,)
        assert st["assignments"].shape == (N,)
        for key in ("beta", "logz", "ess", "acceptance", "efficiency"):
            assert np.isscalar(st[key]) or np.ndim(st[key]) == 0

    def test_sample_save_every_writes_checkpoints(self, tmp_path):
        s = Sampler(
            prior_transform, log_likelihood, n_dim=N_DIM, n_particles=64,
            clustering=False, random_state=0, output_dir=str(tmp_path),
            output_label="manual",
        )
        for _ in range(7):
            s.sample(save_every=3)
        files = list(tmp_path.glob("manual_*.state"))
        assert files, "periodic checkpoints must be written by sample()"

    def test_manual_loop_each_kernel_and_resampler(self):
        for kernel in ("tpcn", "rwm"):
            for method in ("mult", "syst"):
                s = Sampler(
                    prior_transform, log_likelihood, n_dim=N_DIM,
                    n_particles=64, sample=kernel, resample=method,
                    clustering=False, random_state=1,
                )
                st = s.sample()
                for _ in range(30):
                    st = s.sample()
                    if 1.0 - st["beta"] < 1e-4:
                        break
                assert st["beta"] > 0.5, (kernel, method, st["beta"])

    def test_particles_update_between_steps(self):
        s = make_sampler()
        a = s.sample()
        b = s.sample()
        assert not np.allclose(a["x"], b["x"])

    def test_sample_beta_monotone_and_calls_increase(self):
        s = make_sampler()
        prev = s.sample()
        for _ in range(10):
            st = s.sample()
            assert st["beta"] >= prev["beta"]
            assert st["calls"] > prev["calls"]
            assert st["iter"] == prev["iter"] + 1
            prev = st


class TestFusedHostEquality:
    """The per-stage host loop and the fused single-dispatch iteration
    consume identical RNG streams (one key per iteration, split
    (train, resample, mutate); warm-up takes the whole iteration key) and
    must therefore produce identical ladders and evidence on any backend.
    TPU counterpart: tests/test_tpu_smoke.py::test_fused_vs_host_loop_equality."""

    def _pair(self, clustering):
        import jax.numpy as jnp
        from tempest_tpu import Sampler

        def prior(u):
            return -10.0 + 20.0 * u

        def loglike(x):
            return -0.5 * jnp.sum(x * x, axis=-1)

        out = []
        for fused in (True, False):
            s = Sampler(
                prior, loglike, n_dim=3, n_particles=32, vectorize=True,
                clustering=clustering, random_state=11, history_capacity=24,
                fused=fused,
            )
            # Guard against the two samplers silently running the same code
            # path (a prior version of this test omitted fused=... and
            # compared a run to an identical replay).
            assert (s._core._fused_iter is not None) == fused
            s.run(n_total=64, progress=False)
            out.append(s)
        return out

    @pytest.mark.parametrize("clustering", [False, True])
    def test_identical_ladder_and_logz(self, clustering):
        sf, sh = self._pair(clustering)
        t_f, t_h = int(sf.state.hist.t), int(sh.state.hist.t)
        assert t_f == t_h
        bf = np.asarray(sf.state.hist.beta)[:t_f]
        bh = np.asarray(sh.state.hist.beta)[:t_h]
        assert np.array_equal(bf, bh)
        assert float(sf.logz) == float(sh.logz)

    def test_on_device_chunked_dispatch_bit_exact(self):
        """Chunked whole-run re-entry (tiny dispatch budget => one
        iteration per device dispatch) must be bit-identical to the
        host loop: chunk boundaries change neither the RNG chain nor any
        computed value."""
        import dataclasses
        import jax.numpy as jnp
        from tempest_tpu import Sampler
        from tempest_tpu.core import SamplerCore

        def prior(u):
            return -10.0 + 20.0 * u

        def loglike(x):
            return -0.5 * jnp.sum(x * x, axis=-1)

        def build():
            return Sampler(
                prior, loglike, n_dim=3, n_particles=32, vectorize=True,
                clustering=True, random_state=11, history_capacity=24,
            )

        chunked = build()
        # Force the smallest possible chunks (per_iter_est floors at 0.02s,
        # so a 1e-6 s budget yields one iteration per dispatch).
        chunked._core = SamplerCore(
            dataclasses.replace(
                chunked._core.config, on_device_dispatch_budget_s=1e-6
            )
        )
        chunked.run(n_total=64, progress=False, on_device=True)

        host = build()
        host.run(n_total=64, progress=False, on_device=False)

        t_c, t_h = int(chunked.state.hist.t), int(host.state.hist.t)
        assert t_c == t_h
        assert np.array_equal(
            np.asarray(chunked.state.hist.beta)[:t_c],
            np.asarray(host.state.hist.beta)[:t_h],
        )
        assert float(chunked.logz) == float(host.logz)

    def test_on_device_large_history_warns(self):
        # The warning must fire BEFORE the whole-run program is built, so
        # stub the fused-run constructor and lower the (6 GiB) bar on the
        # instance: the test asserts the guard logic, not the constant.
        import warnings
        import jax.numpy as jnp
        from tempest_tpu import Sampler

        s = Sampler(
            lambda u: u, lambda x: -jnp.sum(x * x, axis=-1), n_dim=4,
            n_particles=64, vectorize=True, random_state=0,
            history_capacity=16,
        )

        class _Stop(Exception):
            pass

        def _boom(*a, **k):
            raise _Stop()

        s._core._fused_run = _boom
        s._core._ON_DEVICE_HISTORY_BYTES_WARN = 1  # everything exceeds this
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            with pytest.raises(_Stop):
                s._core._run_on_device(32)
            assert any("HBM" in str(x.message) for x in w)
