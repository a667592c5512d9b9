"""Fused one-iteration PS step: the whole pipeline in a single jitted program.

The complete iteration — reweight (bracket + beta bisection), weight
trimming, hierarchical GMM clustering (the whole BIC-gated bisecting loop,
see cluster.hgm_fit), per-mode Student-t training, resampling, and the full
adaptive MCMC mutation — compiles into ONE XLA program with no host
round-trips. This is both the single-chip speed-of-light path and the
multi-chip SPMD path: with the history/current buffers sharded over a
`particles` mesh axis, XLA inserts the psum / all-gather collectives for
the weight reductions and resampling gathers.

`cluster_every > 1` is handled by carrying the fitted ClusterModel (plus a
validity flag) through the iteration signature: the refit runs under a
`lax.cond` on the cadence, so off-cadence iterations skip the whole
hierarchical-GMM program and reuse the carried model — the same reuse the
host Trainer implements (steps/train.py), with zero host round-trips.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .config import DOF_FALLBACK, TRIM_BINS, TRIM_ESS, SamplerConfig
from .cluster import cluster_predict, hgm_fit, single_cluster_model
from .mcmc import make_mcmc_kernel
from .modes import fit_global_mode, fit_mode_statistics
from .ops.boundary import make_boundary_masks
from .ops.tools import trim_weights_mask
from .state import Current, History, commit, compute_logw_and_logz
from .steps.mutate import make_warmup_kernel
from .steps.resample import resample as resample_step
from .steps.reweight import reweight as reweight_step


def _make_iteration_fn(
    config: SamplerConfig,
    log_likelihood_batch: Callable,
    prior_transform_batch: Callable,
    have_blobs: Optional[bool] = None,
) -> Callable:
    """Unjitted single-iteration fn: (key, hist, cur) -> (hist, cur).

    Supports both the global Student-t preconditioner (clustering off) and
    the full clustered path (hierarchical GMM + per-mode statistics) as long
    as `cluster_every == 1` (every-iteration refits carry no state between
    iterations). The caller handles the warm-up (t == 0) iteration and
    capacity growth.
    """
    cfg = config
    clustered = cfg.clustering
    k_max = cfg.k_max if clustered else 1
    p_mask, r_mask, s_mask = make_boundary_masks(cfg.n_dim, cfg.periodic, cfg.reflective)
    mcmc = make_mcmc_kernel(
        log_likelihood_batch,
        prior_transform_batch,
        cfg.n_dim,
        method=cfg.sample,
        n_steps=cfg.n_steps,
        n_max_steps=cfg.n_max_steps,
        periodic_mask=p_mask,
        reflective_mask=r_mask,
        strict_mask=s_mask,
        n_candidates=cfg.n_candidates,
        have_blobs=(
            cfg.blobs_dtype is not None if have_blobs is None else have_blobs
        ),
        hardware_prng=cfg.hardware_prng,
    )
    dummy_cluster = single_cluster_model(cfg.n_dim, k_max, cfg.dtype)
    warmup = make_warmup_kernel(
        log_likelihood_batch, prior_transform_batch, cfg.n_particles, cfg.n_dim, cfg.dtype
    )
    # Same clusterer parameters as steps/train.py's Trainer (which mirrors
    # core.py:57-69 in the reference): fixed fit seed 42, min_points 2*d
    # (4*d when n_max_clusters caps K), at most k_max-1 split rounds.
    hgm_min_points = 2 * cfg.n_dim if cfg.n_max_clusters is None else 4 * cfg.n_dim
    hgm_max_rounds = max(
        min(1000 if cfg.n_max_clusters is None else cfg.n_max_clusters - 1, k_max - 1),
        0,
    )

    def _mutate_branch(args):
        key, hist, cur, weights, model, fitted = args
        # k_train retained in the split so RNG streams stay stable across
        # the round that removed resampling from the mode fits.
        _k_train, k_res, k_mut = jax.random.split(key, 3)
        N = cfg.n_particles

        # Geometry fits see only the top-train_max_points samples BY WEIGHT
        # once the history exceeds that size: the trimmed history carries
        # only ~ess_ratio*N effective samples, so the discarded tiny-weight
        # tail contributes nothing to the weighted EM fits, while the cost
        # drops by S/train_max_points. Selection (not resampling!) keeps
        # the true weights and introduces no duplicate point-atoms — a
        # resampled subsample was measured to fool the BIC splitter into
        # splitting duplicated atoms and losing real modes.
        m_cap = cfg.train_max_points
        S = hist.capacity * N
        if cfg.mesh is not None:
            # Sharded path: per-shard top-k + merge (O(m) comm); the
            # selection subsumes trimming — every weight that could
            # survive the 0.99-ESS trim is inside the top-m by weight
            # (see parallel/collective.py).
            from .parallel.collective import sharded_select_fit_points

            u_fit, w_fit, keep_fit = sharded_select_fit_points(
                cfg.mesh, cfg.particle_axis, hist.u, weights, hist.t,
                min(m_cap or S, S),
            )
        else:
            keep_mask, w_trim = trim_weights_mask(
                weights.reshape(-1),
                mask=hist.sample_mask().reshape(-1),
                ess=TRIM_ESS,
                bins=TRIM_BINS,
            )
            if m_cap and m_cap < S:
                w_fit, idx = jax.lax.top_k(w_trim, m_cap)
                # Flattened single-axis gather (see state.gather_history:
                # the 2-axis form costs full-history transposed copies).
                u_fit = hist.u.reshape(cfg.n_dim, -1)[:, idx].T
                keep_fit = w_fit > 0.0
            else:
                u_fit = hist.u.reshape(cfg.n_dim, -1).T
                w_fit = w_trim
                keep_fit = keep_mask

        if clustered:
            def do_fit(_):
                m, _, _ = hgm_fit(
                    jax.random.PRNGKey(42),
                    u_fit,
                    w_fit,
                    keep_fit,
                    jnp.asarray(hgm_min_points, jnp.int32),
                    jnp.asarray(cfg.split_threshold, cfg.dtype),
                    k_max,
                    "full",
                    hgm_max_rounds,
                    cfg.normalize,
                    split_all=cfg.split_all,
                    leaf_fit_points=cfg.leaf_fit_points or None,
                )
                return m

            if cfg.cluster_every == 1:
                cluster_model = do_fit(None)
            else:
                # Refit on the cadence, or when the carried model is still
                # the initial placeholder — the same rule the host Trainer
                # applies (steps/train.py run(); reference train.py:97-115).
                refit = (~fitted) | (
                    jnp.mod(cur.iteration, cfg.cluster_every) == 0
                )
                cluster_model = jax.lax.cond(
                    refit, do_fit, lambda _: model, None
                )
            labels = cluster_predict(cluster_model, u_fit)
            modes = fit_mode_statistics(
                u_fit, w_fit, labels, k_max=k_max, dof_fallback=DOF_FALLBACK
            )
        else:
            cluster_model = dummy_cluster
            modes = fit_global_mode(u_fit, w_fit, dof_fallback=DOF_FALLBACK)
        if cfg.mesh is not None:
            from .parallel.collective import sharded_resample

            u, x, logl, blobs = sharded_resample(
                k_res, cfg.mesh, cfg.particle_axis, hist, weights,
                cfg.n_particles, method=cfg.resample,
            )
            if clustered:
                assignments = cluster_predict(cluster_model, u)
            else:
                assignments = jnp.zeros((cfg.n_particles,), dtype=jnp.int32)
        else:
            u, x, logl, blobs, assignments = resample_step(
                k_res, hist, weights, cluster_model, cfg.n_particles,
                method=cfg.resample, clustering=clustered,
            )
        res = mcmc(k_mut, u, x, logl, blobs, assignments, cur.beta, modes)
        new_cur = cur.replace(
            u=res.u, x=res.x, logl=res.logl, blobs=res.blobs,
            assignments=assignments,
            efficiency=res.efficiency.astype(cfg.dtype),
            acceptance=res.acceptance.astype(cfg.dtype),
            steps=res.steps,
            calls=cur.calls + res.n_call_sweeps,
        )
        return new_cur, cluster_model, jnp.asarray(True)

    def _warmup_branch(args):
        key, hist, cur, _weights, model, fitted = args
        wr = warmup(key)
        new_cur = cur.replace(
            u=wr.u, x=wr.x, logl=wr.logl, blobs=wr.blobs,
            assignments=jnp.zeros((cfg.n_particles,), jnp.int32),
            logz=cur.logz + wr.logz_correction,
            calls=cur.calls + 1,  # one full-batch sweep
            steps=jnp.asarray(1, jnp.int32),
            acceptance=jnp.asarray(1.0, cfg.dtype),
            efficiency=jnp.asarray(1.0, cfg.dtype),
        )
        return new_cur, model, fitted

    def iteration(
        key: jax.Array, hist: History, cur: Current, model, fitted
    ):
        # --- reweight -----------------------------------------------------
        # t == 0 (nothing committed yet): no reweighting is possible — the
        # reweight outputs are overridden with the first-iteration values
        # (beta=0, logz=0, ESS=ess_ratio*N; core.py here mirrors the
        # reference's first-iteration handling, reweight.py:365-383). The
        # reweight math still executes on garbage inputs, but every loop in
        # it is bounded and its NaNs are discarded by the selects below.
        rw = reweight_step(
            hist,
            cur.beta,
            cfg.ess_ratio * cfg.n_particles,
            cv_target=cfg.volume_variation or 0.0,
            dynamic=cfg.volume_variation is not None,
            use_pallas=cfg.mesh is None,
        )
        is_first = hist.t == 0
        zero = jnp.asarray(0.0, cfg.dtype)
        ess0 = jnp.asarray(cfg.ess_ratio * cfg.n_particles, cfg.dtype)
        cur = cur.replace(
            beta=jnp.where(is_first, zero, rw.beta.astype(cfg.dtype)),
            logz=jnp.where(is_first, cur.logz, rw.logz.astype(cfg.dtype)),
            ess=jnp.where(is_first, ess0, rw.ess.astype(cfg.dtype)),
            cv=jnp.where(is_first, zero, rw.cv.astype(cfg.dtype)),
            iteration=cur.iteration + 1,
        )

        # beta == 0: target is still the prior — fresh draws instead of
        # train/resample/MCMC (train.py:79-88, resample.py:68-72,
        # mutate.py:99-149). Otherwise the full mutate pipeline, reusing
        # the MIS weights the reweighter just computed.
        cur, model, fitted = jax.lax.cond(
            cur.beta == 0.0, _warmup_branch, _mutate_branch,
            (key, hist, cur, rw.weights, model, fitted),
        )

        hist = commit(hist, cur)
        return hist, cur, model, fitted

    return iteration


def _pin_history_layouts(hist: History) -> History:
    """Pin the big history leaves to the default (d-major, N-minor) layout.

    On TPU, layout assignment for the whole-run program chooses PERMUTED
    layouts for the loop-carried history coordinates — measured at 100-D x
    cap 192: u carried as {2,0,1} and x as {0,2,1} (d-minor, lane-padded
    100->128, 1.28x bytes) — inserting full-history transpose copies
    between the entry buffers and the while-loop carry. Those copies (a)
    defeat the donation aliasing that keeps ONE resident history and (b)
    add two full-history temporaries in permuted layouts, which is what
    pushed the N=49152 x cap192 compile to 19.87G vs 15.75G HBM (round-5
    open item). Constraining the carried values to the default layout
    keeps carry == entry == output layouts, so donation aliases straight
    through the loop. Gated to TPU: the CPU backend (test mesh) has no
    layout assignment worth fighting, and constraint support there is
    spotty.

    Escape hatch: set TEMPEST_TPU_NO_LAYOUT_PIN=1 to disable (the pin is
    validated single-chip on this rig incl. under the virtual-mesh
    equality tests, but real multi-chip TPU hardware was unavailable; if
    a pod toolchain ever rejects the constraint, disabling costs only
    the extra carried-copy memory, not correctness).
    """
    import os

    if jax.default_backend() not in ("tpu", "axon"):
        return hist
    if os.environ.get("TEMPEST_TPU_NO_LAYOUT_PIN"):
        return hist
    from jax.experimental.layout import Layout, with_layout_constraint

    def pin(a):
        return with_layout_constraint(
            a, Layout(major_to_minor=tuple(range(a.ndim)))
        )

    repl = dict(u=pin(hist.u), x=pin(hist.x))
    if hist.blobs is not None:
        repl["blobs"] = pin(hist.blobs)
    return hist.replace(**repl)


def _donation_enabled(config: SamplerConfig) -> bool:
    """Donate (hist, cur) into the fused programs?

    On the CPU backend with a (virtual-device) mesh, donated buffers can
    trigger an abort inside XLA:CPU's per-op collective thunks in some
    configurations (round-4 bisect: the bimodal k_max=4 mesh test dies
    with donation on, passes with it off; the single-device CPU path and
    the TPU backend are unaffected). Donation buys nothing on the test
    mesh — shards are tiny — so it is disabled exactly there.
    """
    if not config.donate_state:
        return False
    if config.mesh is None:
        return True
    try:
        return jax.default_backend() != "cpu"
    except RuntimeError:  # pragma: no cover — backend not initialized
        return True


def _state_out_shardings(config: SamplerConfig, have_blobs: Optional[bool] = None):
    """(hist, cur, model, fitted) output shardings for the fused programs.

    Without the explicit constraint the SPMD partitioner may decide to
    replicate the (small) outputs, silently dropping the particle-axis
    sharding for the next iteration's inputs. Returns None when no mesh is
    configured.
    """
    if config.mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import current_sharding, history_sharding

    h_sh = history_sharding(config.mesh, config.particle_axis)
    c_sh = current_sharding(config.mesh, config.particle_axis)
    if not (config.blobs_dtype is not None if have_blobs is None else have_blobs):
        h_sh = h_sh.replace(blobs=None)
        c_sh = c_sh.replace(blobs=None)
    rep = NamedSharding(config.mesh, P())
    return h_sh, c_sh, rep, rep


def make_fused_iteration(
    config: SamplerConfig,
    log_likelihood_batch: Callable,
    prior_transform_batch: Callable,
    have_blobs: Optional[bool] = None,
) -> Callable:
    """Jitted single PS iteration:
    (key, hist, cur, model, fitted) -> (hist, cur, model, fitted).

    `model` is the carried ClusterModel (reused between refits when
    cluster_every > 1); `fitted` marks whether it holds a real fit yet.
    """
    fn = _make_iteration_fn(
        config, log_likelihood_batch, prior_transform_batch, have_blobs
    )
    # Donating (hist, cur) lets XLA alias the input history with the
    # output buffers: without it the program must preserve the caller's
    # history (JAX input semantics), so every iteration holds TWO copies
    # of the multi-GiB buffers. Callers (core.execute_iteration) always
    # rebind to the outputs, never reusing the donated arrays.
    donate = (1, 2) if _donation_enabled(config) else ()
    out_sh = _state_out_shardings(config, have_blobs)
    if out_sh is None:
        return jax.jit(fn, donate_argnums=donate)
    return jax.jit(fn, out_shardings=out_sh, donate_argnums=donate)


def make_fused_run(
    config: SamplerConfig,
    log_likelihood_batch: Callable,
    prior_transform_batch: Callable,
    have_blobs: Optional[bool] = None,
) -> Callable:
    """The whole annealing run as ONE device program.

    `lax.while_loop` over fused iterations with the reference's termination
    predicate (continue while 1 - beta >= 1e-4 or posterior ESS < n_total;
    core.py:360-374) evaluated on-device, bounded by the history capacity.
    Zero host round-trips between iterations — this is the speed-of-light
    single-chip path and the multi-chip SPMD path (shard hist/cur on the
    particle axis before calling).

    Caller must have committed the warm-up iteration (hist.t >= 1) and
    sized the history capacity for the full run; if the capacity fills
    before termination, the loop exits early with hist.t == capacity and
    the caller can grow + re-enter.
    """
    iteration = _make_iteration_fn(
        config, log_likelihood_batch, prior_transform_batch, have_blobs
    )
    from .ops.tools import ess_from_logw

    def run(key: jax.Array, hist: History, cur: Current, n_total, model, fitted, t_stop):
        """`key` is the sampler's MASTER key chain, not a one-shot subkey:
        the loop body performs the same `key, k = split(key)` advance the
        host loop's `_next_key()` does per iteration, and the final master
        key is returned so the caller stays on the identical stream. The
        whole-run path and the per-iteration host loop are therefore
        bit-exact replicas of each other (validated at multi-GiB scale by
        benchmarks/fused_run_validation.py).

        `t_stop` (traced) bounds how many committed iterations this
        DISPATCH may reach: the host re-enters with fresh bounds until
        termination. Chunking exists because single device executions
        longer than ~a minute crash the relayed TPU worker (round-4
        measurement: a 16 KB-state program dies at ~5 min wall, passes at
        ~30 s — a watchdog, not memory; this was the real cause of the
        round-3 'multi-GiB history' crash). Chunk boundaries change
        neither the RNG chain nor any computed value, so chunked,
        single-dispatch, and host-loop execution are all bit-identical.
        """
        capacity = hist.capacity

        def cond(c):
            _, hist, cur, _, _ = c

            def ess_below_target(h):
                # O(T_max*N) posterior-ESS check — only needed once beta has
                # reached 1 (before that the beta predicate alone continues
                # the loop), so gate it behind lax.cond instead of paying
                # ~2.5ms of logsumexp traffic every iteration.
                logw, _ = compute_logw_and_logz(h, 1.0)
                return ess_from_logw(logw) < n_total

            beta_unfinished = 1.0 - cur.beta >= 1e-4
            not_term = jax.lax.cond(
                beta_unfinished, lambda h: jnp.asarray(True), ess_below_target, hist
            )
            return not_term & (hist.t < jnp.minimum(capacity, t_stop))

        def body(c):
            key, hist, cur, model, fitted = c
            key, k = jax.random.split(key)
            hist, cur, model, fitted = iteration(k, hist, cur, model, fitted)
            return key, _pin_history_layouts(hist), cur, model, fitted

        key, hist, cur, model, fitted = jax.lax.while_loop(
            cond, body, (key, _pin_history_layouts(hist), cur, model, fitted)
        )

        # Final evidence at beta=1 over the full history (core.py:148-151)
        _, logz = compute_logw_and_logz(hist, 1.0)
        cur = cur.replace(logz=logz.astype(cfg.dtype))
        return key, hist, cur, model, fitted

    cfg = config
    # Donation keeps the whole-run program at ONE resident history copy:
    # un-donated, XLA must copy the history into the loop carry while
    # preserving the input — two full copies live for the entire run.
    # (Verified by compiled.memory_analysis() at N=2^19 x capacity 48:
    # alias_size == argument_size == 2.13 GiB, temps 3.8 GiB.)
    donate = (1, 2) if _donation_enabled(config) else ()
    out_sh = _state_out_shardings(config, have_blobs)
    if out_sh is None:
        return jax.jit(run, donate_argnums=donate)
    from jax.sharding import NamedSharding, PartitionSpec as P

    key_sh = NamedSharding(config.mesh, P())
    return jax.jit(run, out_shardings=(key_sh,) + out_sh, donate_argnums=donate)
