"""MCMC kernel tests — boundary-condition ports of reference tests/test_mcmc.py
plus distribution checks on the vectorized tpCN/RWM kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from tempest_tpu.mcmc import make_mcmc_kernel
from tempest_tpu.modes import make_mode_statistics
from tempest_tpu.ops.boundary import (
    apply_boundary_conditions,
    check_bounds,
    make_boundary_masks,
)


class TestBoundaryConditions:
    def test_periodic_wrap(self):
        p, r, s = make_boundary_masks(3, periodic=[0, 2])
        u = jnp.asarray([[1.3, 0.5, -0.2]])
        out = np.array(apply_boundary_conditions(u, p, r))
        np.testing.assert_allclose(out[0], [0.3, 0.5, 0.8], atol=1e-6)

    def test_reflective_fold(self):
        p, r, s = make_boundary_masks(2, reflective=[0])
        u = jnp.asarray([[1.3, 0.5]])
        out = np.array(apply_boundary_conditions(u, p, r))
        np.testing.assert_allclose(out[0], [0.7, 0.5], atol=1e-6)

    def test_reflective_multi_fold_parity(self):
        p, r, s = make_boundary_masks(1, reflective=[0])
        # 2.3 -> even number of crossings -> remainder 0.3
        out = np.array(apply_boundary_conditions(jnp.asarray([[2.3]]), p, r))
        np.testing.assert_allclose(out[0, 0], 0.3, atol=1e-6)
        # -0.2 -> floor = -1 (odd) -> 1 - 0.8 = 0.2
        out = np.array(apply_boundary_conditions(jnp.asarray([[-0.2]]), p, r))
        np.testing.assert_allclose(out[0, 0], 0.2, atol=1e-6)

    def test_mixed(self):
        p, r, s = make_boundary_masks(3, periodic=[0], reflective=[1])
        u = jnp.asarray([[1.25, -0.25, 0.5]])
        out = np.array(apply_boundary_conditions(u, p, r))
        np.testing.assert_allclose(out[0], [0.25, 0.25, 0.5], atol=1e-6)

    def test_check_bounds_strict(self):
        p, r, s = make_boundary_masks(2)
        u = jnp.asarray([[0.5, 0.5], [1.2, 0.5], [-0.1, 0.3]])
        ok = np.array(check_bounds(u, s))
        assert ok.tolist() == [True, False, False]

    def test_check_bounds_special_indices_exempt(self):
        p, r, s = make_boundary_masks(2, periodic=[0])
        u = jnp.asarray([[1.5, 0.5], [0.5, 1.5]])
        ok = np.array(check_bounds(u, s))
        assert ok.tolist() == [True, False]

    def test_input_not_mutated(self):
        p, r, s = make_boundary_masks(1, periodic=[0])
        u = jnp.asarray([[1.5]])
        _ = apply_boundary_conditions(u, p, r)
        np.testing.assert_allclose(np.array(u), [[1.5]])


def _make_kernel_and_state(method="tpcn", n=256, d=2, seed=0, **kw):
    """Target: N(0.5, 0.05^2 I) inside the unit cube (in u space)."""

    def prior_batch(u):
        return u

    def loglike_batch(x):
        return -0.5 * jnp.sum(((x - 0.5) / 0.05) ** 2, axis=-1), None

    kernel = make_mcmc_kernel(
        loglike_batch, prior_batch, d, method=method, n_steps=2, n_max_steps=20, **kw
    )
    modes = make_mode_statistics(
        means=jnp.full((1, d), 0.5),
        covariances=jnp.eye(d)[None] * 0.05**2,
        degrees_of_freedom=jnp.asarray([1e6]),
    )
    rng = np.random.default_rng(seed)
    u = jnp.asarray(0.5 + 0.05 * rng.standard_normal((n, d)), jnp.float32)
    u = jnp.clip(u, 0.01, 0.99)
    x = u
    logl, _ = loglike_batch(x)
    assignments = jnp.zeros((n,), jnp.int32)
    return kernel, modes, u, x, logl, assignments


class TestMCMCKernels:
    def test_tpcn_preserves_target(self):
        kernel, modes, u, x, logl, assign = _make_kernel_and_state("tpcn")
        res = kernel(
            jax.random.PRNGKey(0), u, x, logl, None, assign,
            jnp.asarray(1.0, jnp.float32), modes,
        )
        out = np.array(res.u)
        assert np.all((out >= 0) & (out <= 1))
        assert abs(out.mean() - 0.5) < 0.01
        assert abs(out.std() - 0.05) < 0.01
        assert float(res.acceptance) > 0.1
        assert int(res.steps) >= 2 * 2  # n_steps * n_dim minimum

    def test_rwm_preserves_target(self):
        kernel, modes, u, x, logl, assign = _make_kernel_and_state("rwm", seed=1)
        res = kernel(
            jax.random.PRNGKey(1), u, x, logl, None, assign,
            jnp.asarray(1.0, jnp.float32), modes,
        )
        out = np.array(res.u)
        assert abs(out.mean() - 0.5) < 0.01
        assert abs(out.std() - 0.05) < 0.012
        assert float(res.acceptance) > 0.05

    def test_calls_accounting(self):
        kernel, modes, u, x, logl, assign = _make_kernel_and_state("tpcn")
        res = kernel(
            jax.random.PRNGKey(2), u, x, logl, None, assign,
            jnp.asarray(0.5, jnp.float32), modes,
        )
        # Device counters are in sweep units: one sweep per adaptive step.
        assert int(res.n_call_sweeps) == int(res.steps)

    def test_steps_bounded(self):
        kernel, modes, u, x, logl, assign = _make_kernel_and_state("tpcn")
        res = kernel(
            jax.random.PRNGKey(3), u, x, logl, None, assign,
            jnp.asarray(1.0, jnp.float32), modes,
        )
        d = 2
        assert 2 * d <= int(res.steps) <= 20 * d

    def test_deterministic_given_key(self):
        kernel, modes, u, x, logl, assign = _make_kernel_and_state("tpcn")
        r1 = kernel(
            jax.random.PRNGKey(4), u, x, logl, None, assign,
            jnp.asarray(1.0, jnp.float32), modes,
        )
        r2 = kernel(
            jax.random.PRNGKey(4), u, x, logl, None, assign,
            jnp.asarray(1.0, jnp.float32), modes,
        )
        np.testing.assert_array_equal(np.array(r1.u), np.array(r2.u))

    def test_periodic_kernel_stays_wrapped(self):
        p, r, s = make_boundary_masks(2, periodic=[0, 1])
        kernel, modes, u, x, logl, assign = _make_kernel_and_state(
            "tpcn", periodic_mask=p, reflective_mask=r, strict_mask=s
        )
        res = kernel(
            jax.random.PRNGKey(5), u, x, logl, None, assign,
            jnp.asarray(1.0, jnp.float32), modes,
        )
        out = np.array(res.u)
        assert np.all((out >= 0) & (out <= 1))
