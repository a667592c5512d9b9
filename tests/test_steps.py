"""Step-level tests against hand-built state (reference test_steps.py model).

Each pipeline step is driven in isolation on a manually populated History:
Trainer (clustered + global paths, cluster_every reuse), the resampling
step (selection follows weights, masked slots never picked, blob gather),
and the warm-up kernel (infinite-logl patch + logZ correction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempest_tpu.state import commit, make_current, make_history
from tempest_tpu.steps.mutate import make_warmup_kernel
from tempest_tpu.steps.resample import resample as resample_step
from tempest_tpu.steps.train import Trainer


N, D = 64, 2


def build_history(n_iters=2, bimodal=False, blobs=False, seed=0):
    rng = np.random.default_rng(seed)
    blob_size = 1 if blobs else None
    hist = make_history(4, N, D, blob_size=blob_size)
    cur = make_current(N, D, blob_size=blob_size)
    for t in range(n_iters):
        if bimodal:
            centers = np.where(rng.random(N)[:, None] < 0.5, 0.15, 0.85)
            u = rng.normal(centers, 0.03, (N, D)).clip(0.001, 0.999)
        else:
            u = rng.uniform(0.3, 0.7, (N, D))
        x = 20.0 * u - 10.0
        logl = -0.5 * np.sum(x**2, axis=-1)
        cur = cur.replace(
            u=jnp.asarray(u, jnp.float32),
            x=jnp.asarray(x, jnp.float32),
            logl=jnp.asarray(logl, jnp.float32),
            beta=jnp.asarray(0.1 * (t + 1), jnp.float32),
            logz=jnp.asarray(-0.5 * t, jnp.float32),
        )
        if blobs:
            cur = cur.replace(blobs=jnp.asarray(x.sum(-1, keepdims=True), jnp.float32))
        hist = commit(hist, cur)
    return hist


def uniform_weights(hist):
    n_valid = int(hist.t) * N
    w = np.zeros(hist.capacity * N)
    w[:n_valid] = 1.0 / n_valid
    return jnp.asarray(w, jnp.float32)


class TestTrainer:
    def test_global_fit_covers_particles(self):
        hist = build_history()
        tr = Trainer(n_dim=D, k_max=1, clustering=False, n_particles=N)
        modes = tr.run(jax.random.PRNGKey(0), hist, uniform_weights(hist), 1)
        assert int(modes.n_modes()) == 1
        mean = np.asarray(modes.means[0])
        assert np.all((mean > 0.2) & (mean < 0.8))  # inside the data cloud

    def test_clustered_fit_finds_bimodal(self):
        hist = build_history(bimodal=True)
        tr = Trainer(n_dim=D, k_max=8, clustering=True, n_particles=N)
        modes = tr.run(jax.random.PRNGKey(0), hist, uniform_weights(hist), 1)
        assert int(modes.n_modes()) >= 2

    def test_cluster_every_reuses_model(self):
        hist = build_history(bimodal=True)
        tr = Trainer(n_dim=D, k_max=8, clustering=True, cluster_every=5, n_particles=N)
        tr.run(jax.random.PRNGKey(0), hist, uniform_weights(hist), 5)
        model_first = tr.cluster_model
        tr.run(jax.random.PRNGKey(1), hist, uniform_weights(hist), 6)  # 6 % 5 != 0
        assert tr.cluster_model is model_first
        tr.run(jax.random.PRNGKey(2), hist, uniform_weights(hist), 10)  # refit
        assert tr.cluster_model is not model_first


class TestResampleStep:
    def _model(self, k_max=1):
        from tempest_tpu.cluster import single_cluster_model

        return single_cluster_model(D, k_max)

    @pytest.mark.parametrize("method", ["mult", "syst"])
    def test_concentrated_weight_selects_that_sample(self, method):
        hist = build_history()
        w = np.zeros(hist.capacity * N)
        w[3] = 1.0  # all mass on sample 3 of iteration 0
        u, x, logl, blobs, asn = resample_step(
            jax.random.PRNGKey(0), hist, jnp.asarray(w, jnp.float32),
            self._model(), N, method=method, clustering=False,
        )
        np.testing.assert_allclose(
            np.asarray(u), np.broadcast_to(np.asarray(hist.flat_u()[3]), (N, D))
        )
        np.testing.assert_allclose(
            np.asarray(logl), np.full(N, float(hist.flat_logl()[3])), rtol=1e-6
        )
        assert np.all(np.asarray(asn) == 0)

    @pytest.mark.parametrize("method", ["mult", "syst"])
    def test_masked_slots_never_selected(self, method):
        hist = build_history(n_iters=2)  # capacity 4, slots 2..3 invalid
        u, x, logl, _, _ = resample_step(
            jax.random.PRNGKey(1), hist, uniform_weights(hist),
            self._model(), N, method=method, clustering=False,
        )
        # invalid slots hold logl = -inf; selected set must be finite
        assert np.all(np.isfinite(np.asarray(logl)))

    def test_blob_gather_consistent(self):
        hist = build_history(blobs=True)
        u, x, logl, blobs, _ = resample_step(
            jax.random.PRNGKey(2), hist, uniform_weights(hist),
            self._model(), N, method="mult", clustering=False,
        )
        np.testing.assert_allclose(
            np.asarray(blobs)[:, 0], np.asarray(x).sum(-1), rtol=1e-5
        )


class TestWarmup:
    def _kernel(self, loglike):
        def prior_batch(u):
            return 20.0 * u - 10.0

        def ll_batch(x):
            return loglike(x), None

        return make_warmup_kernel(ll_batch, prior_batch, N, D)

    def test_no_infs_no_correction(self):
        k = self._kernel(lambda x: -0.5 * jnp.sum(x**2, axis=-1))
        res = k(jax.random.PRNGKey(0))
        assert float(res.logz_correction) == 0.0
        assert np.all(np.isfinite(np.asarray(res.logl)))

    def test_inf_patch_and_logz_correction(self):
        # half the prior volume (x0 < 0) is forbidden
        def loglike(x):
            base = -0.5 * jnp.sum(x**2, axis=-1)
            return jnp.where(x[:, 0] < 0.0, -jnp.inf, base)

        k = self._kernel(loglike)
        res = k(jax.random.PRNGKey(0))
        logl = np.asarray(res.logl)
        assert np.all(np.isfinite(logl))           # all patched
        assert np.all(np.asarray(res.x)[:, 0] >= 0.0)
        # correction ~ log(fraction finite) ~ log(0.5)
        corr = float(res.logz_correction)
        assert -1.2 < corr < -0.4

    def test_patch_preserves_u_x_logl_consistency(self):
        def loglike(x):
            return jnp.where(x[:, 0] < 0.0, -jnp.inf,
                             -0.5 * jnp.sum(x**2, axis=-1))

        k = self._kernel(loglike)
        res = k(jax.random.PRNGKey(3))
        x_expected = 20.0 * np.asarray(res.u) - 10.0
        np.testing.assert_allclose(np.asarray(res.x), x_expected, rtol=1e-5)
        ll_expected = -0.5 * np.sum(x_expected**2, axis=-1)
        np.testing.assert_allclose(np.asarray(res.logl), ll_expected, rtol=1e-4)


class TestMutateStep:
    """Mutation-kernel behavior at the step level (reference
    test_steps.py:619-726 drives the Mutator similarly)."""

    def _setup(self, beta=0.7, seed=0):
        from tempest_tpu.mcmc import make_mcmc_kernel
        from tempest_tpu.modes import make_mode_statistics

        def prior_batch(u):
            return 20.0 * u - 10.0

        def ll(x):
            return -0.5 * jnp.sum(x**2, axis=-1)

        kernel = make_mcmc_kernel(
            lambda x: (ll(x), None), prior_batch, D,
            method="tpcn", n_steps=1, n_max_steps=20,
        )
        rng = np.random.default_rng(seed)
        u = jnp.asarray(rng.uniform(0.4, 0.6, (N, D)), jnp.float32)
        x = prior_batch(u)
        logl = ll(x)
        modes = make_mode_statistics(
            means=jnp.full((1, D), 0.5),
            covariances=jnp.eye(D)[None] * 0.005,
            degrees_of_freedom=jnp.array([1e6]),
        )
        asn = jnp.zeros((N,), jnp.int32)
        return kernel, u, x, logl, asn, jnp.asarray(beta, jnp.float32), modes

    def test_state_consistency_after_mutation(self):
        kernel, u, x, logl, asn, beta, modes = self._setup()
        res = kernel(jax.random.PRNGKey(1), u, x, logl, None, asn, beta, modes)
        u_new = np.asarray(res.u)
        assert (u_new > 0).all() and (u_new < 1).all()
        # atol: 20*u - 10 in float32 cancels near u=0.5 (abs error ~1e-6*20)
        np.testing.assert_allclose(
            np.asarray(res.x), 20.0 * u_new - 10.0, rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(res.logl), -0.5 * (np.asarray(res.x) ** 2).sum(-1),
            rtol=1e-4, atol=1e-4,
        )
        assert (u_new != np.asarray(u)).any()  # particles actually moved

    def test_steps_within_adaptive_bounds(self):
        kernel, u, x, logl, asn, beta, modes = self._setup()
        res = kernel(jax.random.PRNGKey(2), u, x, logl, None, asn, beta, modes)
        assert 1 * D <= int(res.steps) <= 20 * D
        assert 0.0 < float(res.acceptance) <= 1.0
        assert int(res.n_call_sweeps) == int(res.steps)

    def test_beta_zero_accepts_everything_in_bounds(self):
        # At beta=0 the tempered ratio is 1: only the Student-t factor and
        # bounds can reject, so acceptance should be high.
        kernel, u, x, logl, asn, _, modes = self._setup()
        res = kernel(
            jax.random.PRNGKey(3), u, x, logl, None, asn,
            jnp.asarray(0.0, jnp.float32), modes,
        )
        assert float(res.acceptance) > 0.3

    def test_per_cluster_means_respected(self):
        # Walkers assigned to well-separated modes must stay near their own
        # mode's center under tpCN (the proposal contracts toward mu_k).
        from tempest_tpu.mcmc import make_mcmc_kernel
        from tempest_tpu.modes import make_mode_statistics

        def prior_batch(u):
            return u  # identity: x == u

        centers = np.array([[0.2] * D, [0.8] * D], dtype=np.float32)

        def ll(x):
            d0 = jnp.sum((x - 0.2) ** 2, axis=-1)
            d1 = jnp.sum((x - 0.8) ** 2, axis=-1)
            return -0.5 * jnp.minimum(d0, d1) / 0.01**2

        kernel = make_mcmc_kernel(
            lambda x: (ll(x), None), prior_batch, D,
            method="tpcn", n_steps=2, n_max_steps=20,
        )
        modes = make_mode_statistics(
            means=jnp.asarray(centers),
            covariances=jnp.broadcast_to(jnp.eye(D) * 0.01**2, (2, D, D)),
            degrees_of_freedom=jnp.array([1e6, 1e6]),
        )
        asn = jnp.asarray(np.repeat([0, 1], N // 2), jnp.int32)
        u0 = jnp.asarray(
            centers[np.asarray(asn)] + np.random.default_rng(0).normal(0, 0.01, (N, D)),
            jnp.float32,
        )
        res = kernel(
            jax.random.PRNGKey(4), u0, u0,
            ll(u0), None, asn, jnp.asarray(1.0, jnp.float32), modes,
        )
        u_new = np.asarray(res.u)
        # each half stayed in its own basin
        assert np.all(np.abs(u_new[: N // 2] - 0.2) < 0.15)
        assert np.all(np.abs(u_new[N // 2 :] - 0.8) < 0.15)
