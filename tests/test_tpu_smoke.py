"""On-TPU smoke suite (`-m tpu`): the backend-specific gates.

The 257-test unit suite runs on a forced 8-virtual-device CPU backend
(tests/conftest.py); these tests are the complement — they execute on the
real TPU (axon) backend and catch backend-specific regressions (Pallas
lowering, tiling/layout, remote-relay quirks) before bench.py does:

    TEMPEST_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -m tpu -q

Kept intentionally tiny: every test uses small shapes so the whole suite
compiles + runs in a few minutes on one chip (warm cache: seconds).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

N_DIM = 4
ANALYTIC_LOGZ = -N_DIM * float(np.log(20.0))


def prior(u):
    return 20.0 * u - 10.0


def loglike(x):
    return -0.5 * jnp.sum(x * x, axis=-1) - 0.5 * N_DIM * jnp.log(2 * jnp.pi)


def make_sampler(**kw):
    from tempest_tpu import Sampler

    kw.setdefault("n_particles", 64)
    kw.setdefault("history_capacity", 32)
    return Sampler(
        prior, loglike, n_dim=N_DIM, vectorize=True, random_state=3, **kw
    )


def test_backend_is_tpu_family():
    assert jax.default_backend() in ("tpu", "axon")


def test_tiny_e2e_evidence():
    """Clustered annealing to beta=1 on-device; logZ within tolerance."""
    s = make_sampler(clustering=True)
    s.run(n_total=128, progress=False)
    assert s.beta == 1.0
    assert abs(s.logz - ANALYTIC_LOGZ) < 0.5


def test_fused_vs_host_loop_equality():
    """The single-dispatch fused iteration and the per-stage host loop
    must produce the same ladder and evidence on the TPU backend."""
    s_fused = make_sampler(clustering=False, fused=True)
    s_fused.run(n_total=128, progress=False)
    s_host = make_sampler(clustering=False, fused=False)
    s_host.run(n_total=128, progress=False)
    assert int(s_fused.state.hist.t) == int(s_host.state.hist.t)
    assert abs(s_fused.logz - s_host.logz) < 1e-3


def test_pallas_bisection_matches_xla():
    """The VMEM bisection kernel vs the XLA while-loop path, on-device."""
    from tempest_tpu.ops.pallas_reweight import ess_bisect_beta, pallas_supported
    from tempest_tpu.state import mis_denominator
    from tempest_tpu.steps.reweight import reweight

    s = make_sampler(clustering=False)
    s.run(n_total=128, progress=False)
    hist = s.state.hist
    if not pallas_supported(hist.logl.size, hist.logl.dtype):
        pytest.skip("history exceeds the Pallas VMEM budget")

    denom = mis_denominator(hist)
    bm = jnp.where(hist.sample_mask(), denom, jnp.inf)
    target = 2.0 * s.n_particles
    beta_prev = jnp.asarray(0.1, jnp.float32)
    beta_pallas = float(
        ess_bisect_beta(hist.logl.reshape(-1), bm.reshape(-1), beta_prev, target)
    )
    rw = reweight(hist, beta_prev, target, use_pallas=False)
    assert abs(beta_pallas - float(rw.beta)) < 2e-3


def test_checkpoint_roundtrip_on_device(tmp_path):
    s = make_sampler(clustering=True)
    s.run(n_total=128, progress=False)
    path = tmp_path / "tpu.state"
    s.save_state(path)
    s2 = make_sampler(clustering=True)
    s2.load_state(path)
    assert int(s2.state.hist.t) == int(s.state.hist.t)
    assert abs(s2.logz - s.logz) < 1e-6
    # resumed state is usable: one more manual step executes
    s2.sample()


def test_history_layout_physical_bytes():
    """(d, T, N) layout: the history must not pay the d->128 lane padding
    the old (T, N, d) layout did (12.8x at d=10)."""
    s = make_sampler(clustering=False, n_particles=256, history_capacity=32)
    s.run(n_total=256, progress=False)
    u = s.state.hist.u
    logical = u.size * u.dtype.itemsize
    stats = u.addressable_shards[0].device.memory_stats()
    if not stats:  # remote backends may not expose memory stats
        pytest.skip("device memory stats unavailable")
    # (4, 32, 256): lane dim 256 is tile-aligned; sublane 32 aligned; the
    # physical footprint should be ~= logical, not 12.8x. We can't read
    # per-buffer physical bytes portably, so assert via on-device usage
    # delta of a fresh allocation of the same shape.
    import jax.numpy as jnp

    before = stats["bytes_in_use"]
    buf = jnp.zeros(u.shape, u.dtype).block_until_ready()
    after = buf.addressable_shards[0].device.memory_stats()["bytes_in_use"]
    phys = after - before
    assert phys <= 2 * logical, f"physical {phys} vs logical {logical}"


def test_fused_run_carry_layout_memory():
    """The whole-run program must not re-layout the loop-carried history.

    Round-5 regression guard: without fused._pin_history_layouts, TPU
    layout assignment carries hist.u/hist.x through the run-level
    while_loop in permuted d-minor layouts, materializing full-history
    transpose copies (temps ~2.4x args at 100-D; the N=49152 x cap192
    compile-OOM). With the pin, temps at this shape measure ~0.68x args
    (one rational d-minor gather-feeding copy remains). AOT-compiles
    only — nothing executes.
    """
    from tempest_tpu import Sampler
    from tempest_tpu.fused import make_fused_run

    d = 100
    s = Sampler(
        lambda u: 20.0 * u - 10.0,
        lambda x: -jnp.sum(x * x, axis=-1),
        n_dim=d,
        n_particles=2048,
        vectorize=True,
        clustering=False,
        random_state=0,
        history_capacity=192,
    )
    core = s.state
    runner = make_fused_run(
        core.config, core._loglike_batch, core._prior_batch, core.have_blobs
    )
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (
            core.key,
            core.hist,
            core.cur,
            jnp.asarray(4096, jnp.int32),
            core._fused_model,
            core._fused_fitted,
            jnp.asarray(192, jnp.int32),
        ),
    )
    compiled = runner.lower(*abstract).compile()
    mem = compiled.memory_analysis()
    if mem is None:
        pytest.skip("memory_analysis unavailable on this backend")
    args_b = mem.argument_size_in_bytes
    temps_b = mem.temp_size_in_bytes
    # Donation must alias the full history through the program.
    assert mem.alias_size_in_bytes >= 0.9 * args_b
    # Pre-fix this ratio was ~2.4; post-fix ~0.68. 1.5 catches the
    # return of a second full-history copy with margin for compiler
    # drift.
    assert temps_b <= 1.5 * args_b, f"temps {temps_b} vs args {args_b}"


def test_hw_prng_statistics():
    """Hardware-PRNG draw kernels (ops/pallas_prng.py): moments of the
    paired Box-Muller normals, the (0,1] uniform mapping, and the
    Marsaglia-Tsang gamma (incl. the alpha<1 boost) against analytic
    values. Tolerances are ~5 sigma for n=2^20 draws."""
    from tempest_tpu.ops.pallas_prng import (
        hw_gamma,
        hw_normal,
        hw_prng_supported,
        hw_uniform,
    )

    assert hw_prng_supported(jnp.float32)
    n = 1 << 20
    z = np.asarray(hw_normal(jax.random.key(0), (n,)))
    assert abs(z.mean()) < 0.005
    assert abs(z.var() - 1.0) < 0.01
    kurt = ((z - z.mean()) ** 4).mean() / z.var() ** 2
    assert abs(kurt - 3.0) < 0.05
    # 3-sigma tail mass (Box-Muller tails must not be clipped early)
    assert abs((np.abs(z) > 3).mean() - 0.0027) < 0.0005

    u = np.asarray(hw_uniform(jax.random.key(1), (n,)))
    assert 0.0 < u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.002
    assert abs(u.var() - 1.0 / 12.0) < 0.001

    for a in (0.5, 1.5, 7.5, 50.0):
        g = np.asarray(hw_gamma(jax.random.key(2), jnp.full((1 << 18,), a, jnp.float32)))
        assert g.min() > 0.0
        assert abs(g.mean() - a) < 5 * np.sqrt(a / (1 << 18)) + 0.01
        assert abs(g.var() - a) < 0.05 * a + 0.02


def test_hw_fused_mutation_draws():
    """Single-launch fused draw kernel (normals + MT gamma + uniforms):
    statistics of all three outputs at the flagship shapes."""
    from tempest_tpu.ops.pallas_prng import fused_draws_supported, hw_mutation_draws

    R, N, d = 8, 1024, 10
    assert fused_draws_supported(R * N * d, N, jnp.float32)
    alpha = jnp.concatenate(
        [jnp.full((N // 2,), 7.5), jnp.full((N // 2,), 0.7)]
    ).astype(jnp.float32)
    zs, gs, us = [], [], []
    for s in range(32):  # aggregate draws for tight moments
        z, g, u = hw_mutation_draws(jax.random.key(s), alpha, (R, N, d))
        zs.append(np.asarray(z).ravel())
        gs.append(np.asarray(g))
        us.append(np.asarray(u))
    z = np.concatenate(zs)
    g = np.stack(gs)
    u = np.concatenate(us)
    assert abs(z.mean()) < 0.005 and abs(z.var() - 1.0) < 0.01
    kurt = ((z - z.mean()) ** 4).mean() / z.var() ** 2
    assert abs(kurt - 3.0) < 0.05
    assert 0.0 < u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.01
    g_hi = g[:, : N // 2].ravel()  # alpha = 7.5
    g_lo = g[:, N // 2 :].ravel()  # alpha = 0.7 (boost path)
    assert g_lo.min() > 0.0
    assert abs(g_hi.mean() - 7.5) < 0.1 and abs(g_hi.var() - 7.5) < 0.3
    assert abs(g_lo.mean() - 0.7) < 0.03 and abs(g_lo.var() - 0.7) < 0.05


def test_hw_prng_e2e_statistical_equivalence():
    """A full clustered annealing with hardware_prng=True completes with
    correct evidence. (At smoke-test walker counts the mcmc size gates
    keep the threefry path — this exercises the flag plumbing end-to-end;
    the hardware kernels themselves are validated statistically above and
    at scale by benchmarks/mutation_roofline.py.)"""
    s = make_sampler(clustering=True, hardware_prng=True)
    s.run(n_total=128, progress=False)
    assert s.beta == 1.0
    assert abs(s.logz - ANALYTIC_LOGZ) < 0.5
