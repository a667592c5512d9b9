"""SamplerCore — the Persistent Sampling orchestration loop.

TPU redesign of /root/reference/tempest/core.py:20-440. The host only
drives the annealing while-loop, the clustering split decisions, progress
reporting, capacity growth, and checkpoints; every array operation —
reweighting (with its complete beta bisection), mode training, resampling,
and the full adaptive MCMC mutation — runs as jitted device programs with
static shapes. One host<->device sync per pipeline stage per iteration.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .cluster import single_cluster_model
from .config import DOF_FALLBACK, SamplerConfig
from .mcmc import make_mcmc_kernel
from .ops.boundary import make_boundary_masks
from .ops.tools import ess_from_logw, systematic_resample
from .ops.tools import trim_weights_mask
from .state import (
    Current,
    History,
    commit,
    compute_logw_and_logz,
    grow_history,
    make_current,
    make_history,
)
from .steps.mutate import make_warmup_kernel
from .steps.resample import resample as resample_step
from .steps.reweight import reweight as reweight_step
from .steps.train import Trainer
from .utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_sharded,
    save_checkpoint,
    save_checkpoint_sharded,
)
from .utils.host import fetch
from .utils.profiling import annotate
from .utils.progress import ProgressBar
from .utils.wrappers import (
    FunctionWrapper,
    build_blob_schema,
    build_log_likelihood,
    build_prior_transform,
)

# Committing on sharded state must run as ONE compiled SPMD program:
# op-by-op eager dispatch on mesh-sharded arrays makes XLA:CPU rendezvous
# per-op collectives from independent executions, which can abort (seen as
# an AllGatherThunk CHECK failure on the 8-virtual-device backend).
_commit_jit = jax.jit(commit)



class SamplerCore:
    """Internal coordinator; the public Sampler facade delegates here."""

    def __init__(self, config: SamplerConfig):
        self.config = config
        cfg = config
        self.n_dim = cfg.n_dim
        self.n_particles = cfg.n_particles
        self.dtype = cfg.dtype
        self.have_blobs = cfg.blobs_dtype is not None

        wrapped = FunctionWrapper(
            cfg.log_likelihood, cfg.log_likelihood_args, cfg.log_likelihood_kwargs
        )
        self.blob_schema = build_blob_schema(
            wrapped,
            cfg.n_dim,
            self.have_blobs,
            cfg.host_likelihood,
            cfg.blobs_dtype,
            declared_size=cfg.blob_size,
            prior_transform=cfg.prior_transform,
            vectorize=cfg.vectorize,
        )
        self.have_blobs = self.blob_schema is not None
        self.blob_size = None if self.blob_schema is None else self.blob_schema.width
        self._blobs_device_dtype = (
            None if self.blob_schema is None else self.blob_schema.device_dtype
        )
        self._prior_batch = build_prior_transform(cfg.prior_transform, cfg.vectorize)
        self._loglike_batch = build_log_likelihood(
            wrapped,
            cfg.vectorize,
            self.have_blobs,
            cfg.host_likelihood,
            cfg.n_particles,
            dtype=cfg.dtype,
            schema=self.blob_schema,
            pool=cfg.pool if cfg.host_likelihood else None,
        )

        p_mask, r_mask, s_mask = make_boundary_masks(cfg.n_dim, cfg.periodic, cfg.reflective)
        k_max = cfg.k_max if cfg.clustering else 1
        self.k_max = k_max
        self._mcmc = make_mcmc_kernel(
            self._loglike_batch,
            self._prior_batch,
            cfg.n_dim,
            method=cfg.sample,
            n_steps=cfg.n_steps,
            n_max_steps=cfg.n_max_steps,
            periodic_mask=p_mask,
            reflective_mask=r_mask,
            strict_mask=s_mask,
            n_candidates=cfg.n_candidates,
            have_blobs=self.have_blobs,
            hardware_prng=cfg.hardware_prng,
        )
        self._warmup = make_warmup_kernel(
            self._loglike_batch, self._prior_batch, cfg.n_particles, cfg.n_dim, cfg.dtype
        )
        self.trainer = Trainer(
            n_dim=cfg.n_dim,
            k_max=k_max,
            clustering=cfg.clustering,
            cluster_every=cfg.cluster_every,
            normalize=cfg.normalize,
            split_threshold=cfg.split_threshold,
            n_max_clusters=cfg.n_max_clusters,
            dof_fallback=DOF_FALLBACK,
            n_particles=cfg.n_particles,
            dtype=cfg.dtype,
            train_max_points=cfg.train_max_points,
            split_all=cfg.split_all,
            leaf_fit_points=cfg.leaf_fit_points,
        )

        # Fused fast path: the entire iteration (reweight + clustering +
        # train + resample + mutate + commit) fuses into ONE jitted program
        # — a single device dispatch per PS iteration (see fused.py). The
        # cluster_every > 1 refit cadence is handled by carrying the fitted
        # model (+ validity flag) through the program. cfg.fused=False keeps
        # the per-stage host loop (debug/profiling escape hatch).
        self._fused_iter = None
        self._fused_model = single_cluster_model(
            cfg.n_dim, k_max, cfg.dtype, normalize=cfg.clustering and cfg.normalize
        )
        self._fused_fitted = jnp.asarray(False)
        if cfg.fused:
            from .fused import make_fused_iteration

            self._fused_iter = make_fused_iteration(
                cfg, self._loglike_batch, self._prior_batch, self.have_blobs
            )

        self.mesh = cfg.mesh
        if self.mesh is not None:
            n_shards = int(np.prod(self.mesh.devices.shape))
            if cfg.n_particles % n_shards != 0:
                raise ValueError(
                    f"n_particles ({cfg.n_particles}) must be divisible by the "
                    f"mesh size ({n_shards}) to shard the particle axis."
                )

        seed = cfg.random_state if cfg.random_state is not None else 0
        self.key = jax.random.PRNGKey(seed)
        self.hist: History = make_history(
            cfg.history_capacity,
            cfg.n_particles,
            cfg.n_dim,
            dtype=cfg.dtype,
            blob_size=self.blob_size,
            blobs_dtype=self._blobs_device_dtype,
        )
        self.cur: Current = make_current(
            cfg.n_particles, cfg.n_dim, dtype=cfg.dtype,
            blob_size=self.blob_size, blobs_dtype=self._blobs_device_dtype,
        )
        self._apply_sharding()
        self.pbar: Optional[ProgressBar] = None
        self.n_total: Optional[int] = None
        self.logz_err = None
        self.t0 = 0

        # jitted termination metric: (posterior ESS, beta)
        self._posterior_ess = jax.jit(
            lambda hist: ess_from_logw(compute_logw_and_logz(hist, 1.0)[0])
        )

    # ------------------------------------------------------------------
    def reset(self, random_state: Optional[int] = None) -> None:
        """Clear sampler state for a fresh run while KEEPING all compiled
        kernels (jit caches are per-closure; rebuilding a Sampler would
        recompile everything)."""
        cfg = self.config
        seed = (
            random_state
            if random_state is not None
            else (cfg.random_state if cfg.random_state is not None else 0)
        )
        self.key = jax.random.PRNGKey(seed)
        self.hist = make_history(
            cfg.history_capacity, cfg.n_particles, cfg.n_dim,
            dtype=cfg.dtype, blob_size=self.blob_size, blobs_dtype=self._blobs_device_dtype,
        )
        self.cur = make_current(
            cfg.n_particles, cfg.n_dim, dtype=cfg.dtype,
            blob_size=self.blob_size, blobs_dtype=self._blobs_device_dtype,
        )
        self.n_total = None
        self.logz_err = None
        self.t0 = 0
        self._fused_model = single_cluster_model(
            cfg.n_dim, self.k_max, cfg.dtype,
            normalize=cfg.clustering and cfg.normalize,
        )
        self._fused_fitted = jnp.asarray(False)
        self._apply_sharding()

    def _apply_sharding(self) -> None:
        """Place history/current with the particle axis sharded over the
        configured mesh (no-op when mesh is None). Every jitted step then
        runs SPMD: weight/ESS reductions lower to psum, the resampling
        gather to an all-to-all (see parallel/mesh.py)."""
        if self.mesh is None:
            return
        from .parallel.mesh import shard_current, shard_history

        axis = self.config.particle_axis
        self.hist = shard_history(self.hist, self.mesh, axis)
        self.cur = shard_current(self.cur, self.mesh, axis)

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _pregrow_capacity(self):
        """Pre-size the history so a typical run never grows mid-flight.

        Growing re-specializes every jitted program on the new shapes (a
        cold whole-run fused compile is minutes on a remote TPU), so when
        the user left history_capacity at its default we allocate an
        n_total-derived estimate up front: the post-beta=1 phase needs
        ~n_total/n_particles commits and an adaptive ESS ladder typically
        takes ~40 (the canonical clustered flagship uses 47 slots total).
        Exceptionally long ladders (e.g. 100-D Rosenbrock, ~180 steps)
        still fall back to geometric growth."""
        if not getattr(self.config, "auto_capacity", False) or self.n_total is None:
            return
        need = -(-int(self.n_total) // self.n_particles) + 40
        need = -(-need // 16) * 16  # round up to a multiple of 16
        if self.hist.capacity < need:
            self.hist = grow_history(self.hist, need)
            if self.mesh is not None:
                from .parallel.mesh import shard_history

                self.hist = shard_history(
                    self.hist, self.mesh, self.config.particle_axis
                )

    def _ensure_capacity(self):
        if int(self.hist.t) >= self.hist.capacity:
            self.hist = grow_history(self.hist, self.hist.capacity * 2)
            if self.mesh is not None:
                from .parallel.mesh import shard_history

                self.hist = shard_history(
                    self.hist, self.mesh, self.config.particle_axis
                )

    # ------------------------------------------------------------------
    def run_sampling(
        self,
        n_total: int = 4096,
        progress: bool = True,
        resume_state_path: Optional[Union[str, Path]] = None,
        save_every: Optional[int] = None,
        on_device: bool = False,
    ) -> None:
        """Full annealing run. Parity: core.py:110-160.

        on_device=True (no periodic saving; clustering off or
        cluster_every == 1): the entire annealing loop executes as one
        device program (fused.make_fused_run) with zero per-iteration host
        round-trips."""
        if resume_state_path is not None:
            self.load_sampler_state(resume_state_path)
            t0 = int(self.cur.iteration)
        else:
            t0 = 0

        self.n_total = int(n_total)
        self.t0 = t0
        self._pregrow_capacity()
        self.pbar = ProgressBar(progress, initial=t0)
        if self.pbar.enabled:
            self.pbar.update_stats(
                dict(
                    beta=float(self.cur.beta),
                    calls=self.calls_total(),
                    ESS=int(self.config.ess_ratio * self.n_particles),
                    logZ=float(self.cur.logz),
                    logL=0.0, acc=0.0, steps=0, eff=0.0, K=1,
                )
            )

        if on_device and self._fused_iter is not None and save_every is None:
            self._run_on_device(n_total)
        else:
            while self._not_termination():
                self.execute_iteration(save_every=save_every, t0=t0)

        # Final evidence at beta=1 over the whole history (core.py:148-151)
        _, logz = compute_logw_and_logz(self.hist, 1.0)
        self.cur = self.cur.replace(logz=logz.astype(self.dtype))
        self.logz_err = None

        if save_every is not None:
            self.save_sampler_state(
                self.config.output_dir / f"{self.config.output_label}_final.state"
            )
        self.pbar.close()

    # Soft ceiling for the whole-run program's RESIDENT state: with
    # (hist, cur) donated (fused.py) the run keeps ONE history copy alive
    # through the while_loop (validated at the round-3 faulting size by
    # benchmarks/fused_run_validation.py), so the warning bar is the
    # history approaching the chip's HBM itself, not the old 1 GiB
    # double-buffering cliff.
    _ON_DEVICE_HISTORY_BYTES_WARN = 6 << 30

    def _run_on_device(self, n_total: int) -> None:
        """Drive the whole-run device loop, growing capacity and re-entering
        if the history fills before termination."""
        from .fused import make_fused_run

        # Full per-sample state: u + x, logl + mis_c, and any blob columns
        # (the old estimate counted only u + x, under-sizing blob-heavy
        # runs).
        itemsize = jnp.dtype(self.dtype).itemsize
        per_sample = (2 * self.n_dim + 2) * itemsize
        if self.blob_size:
            per_sample += self.blob_size * jnp.dtype(
                self._blobs_device_dtype or self.dtype
            ).itemsize
        hist_bytes = per_sample * self.hist.capacity * self.n_particles
        if hist_bytes > self._ON_DEVICE_HISTORY_BYTES_WARN:
            import warnings

            warnings.warn(
                f"on_device=True with a {hist_bytes / 2**30:.1f} GiB history "
                "approaches single-chip HBM; if the run OOMs, use "
                "run(..., on_device=False) (per-iteration dispatch, same "
                "bit-exact results) or shard over a mesh.",
                RuntimeWarning,
                stacklevel=3,
            )
        if not hasattr(self, "_fused_run"):
            self._fused_run = make_fused_run(
                self.config, self._loglike_batch, self._prior_batch, self.have_blobs
            )
        runner = self._fused_run

        # Per-dispatch iteration budget: single device executions longer
        # than ~a minute crash the relayed TPU worker (an execution-length
        # watchdog — measured with a 16 KB-state spin kernel, so it is not
        # memory; this was the real cause of the round-3 "multi-GiB
        # history" crash). The first chunk is sized from a bytes-based
        # per-iteration estimate (measured ~2.4 ns per history byte on the
        # v5e chip, taken with 4x margin), then adapted from each
        # dispatch's measured wall. Chunk boundaries change neither the
        # RNG chain nor any value — chunked and unchunked runs are
        # bit-identical. budget=None restores single-dispatch behavior.
        import time as _time

        budget = self.config.on_device_dispatch_budget_s
        per_iter_est = bytes_floor = None
        measured_once = False
        if budget is not None:
            # Bytes-based prior (~2.4 ns/history-byte measured, 4x margin)
            # and a floor at a quarter of it: early measured iterations are
            # warm-ups (prior draws, several times cheaper than the
            # steady-state mutation iterations) and must not talk the
            # estimate down into watchdog territory.
            per_iter_est = max(0.02, 10e-9 * hist_bytes)
            bytes_floor = 0.25 * per_iter_est

        # The bytes prior knows nothing about the user likelihood's cost, so
        # before any measurement exists the chunk also gets an absolute
        # iteration cap: a likelihood-dominated run (say 0.6 s/iter from a
        # 10 ms model at ~60 mutation sweeps) with a small history would
        # otherwise get a first dispatch of 1000+ iterations and blow the
        # ~60 s worker watchdog before the estimator ever sees a wall. 64
        # keeps every flagship-scale run single-dispatch (their ladders are
        # < 64 iterations) while bounding the unmeasured worst case; host
        # pure_callback likelihoods get a much tighter cap since their
        # per-iteration cost is both unbounded and invisible to the prior.
        first_chunk_cap = 4 if self.config.host_likelihood else 64

        while True:
            t_before = int(self.hist.t)
            if budget is None:
                t_stop = self.hist.capacity
            else:
                chunk = max(1, int(0.5 * budget / per_iter_est))
                if not measured_once:
                    chunk = min(chunk, first_chunk_cap)
                t_stop = min(self.hist.capacity, t_before + chunk)
            t0 = _time.time()
            (
                self.key,
                self.hist,
                self.cur,
                self._fused_model,
                self._fused_fitted,
            ) = runner(
                self.key,
                self.hist,
                self.cur,
                jnp.asarray(n_total, jnp.int32),
                self._fused_model,
                self._fused_fitted,
                jnp.asarray(t_stop, jnp.int32),
            )
            self.trainer._model = self._fused_model
            t_after = int(self.hist.t)  # genuine device sync
            if budget is not None and t_after > t_before:
                measured = (_time.time() - t0) / (t_after - t_before)
                # Asymmetric blend: a SLOWER measurement is trusted
                # immediately (underestimating per-iter cost risks a
                # watchdog kill — fatal), but the estimate only comes DOWN
                # by 4x per dispatch, so one relay-memoized or hiccup-fast
                # wall cannot collapse subsequent chunks; conversely a
                # single cold-compile-bearing dispatch inflates the
                # estimate for only ~log4(inflation) cheap 1-iteration
                # dispatches before it re-converges.
                if measured < per_iter_est:
                    measured = max(measured, per_iter_est / 4.0)
                per_iter_est = max(measured, bytes_floor, 1e-4)
                measured_once = True
            if self.pbar is not None:
                if self.pbar.progress_bar is not None:
                    self.pbar.progress_bar.update(t_after - self.pbar.progress_bar.n)
                self._update_progress_bar()
            if t_after < min(t_stop, self.hist.capacity):
                # The device loop stopped BEFORE its iteration bound, so its
                # cond — the exact termination predicate — failed on-device:
                # no host-side recheck needed. (The recheck costs a beta
                # fetch plus an O(T*N) posterior-ESS dispatch+fetch through
                # the tunnel, ~0.1-0.2 s — a measurable tax on sub-second
                # flagship runs.)
                break
            if t_after >= self.hist.capacity:
                # Capacity filled: termination unknown — check, grow, go on.
                if not self._not_termination():
                    break
                self._ensure_capacity()
            # else: chunk boundary (t_after == t_stop < capacity) —
            # re-enter directly; if the run is actually finished the next
            # dispatch's first cond evaluation exits immediately and the
            # early break above fires.
        self._prune_blob_store()

    def _not_termination(self) -> bool:
        """Continue while (1 - beta >= 1e-4) or posterior ESS < n_total.
        Parity: core.py:360-374."""
        if int(self.hist.t) == 0:
            return True
        beta = float(self.cur.beta)
        if 1.0 - beta >= 1e-4:
            # Short-circuit: the posterior-ESS check only matters once beta
            # has reached 1; skipping it avoids an O(T*N) device program +
            # host sync per iteration on the host-loop path.
            return True
        return float(self._posterior_ess(self.hist)) < (self.n_total or 0)

    # ------------------------------------------------------------------
    def execute_iteration(self, save_every: Optional[int] = None, t0: int = 0) -> dict:
        """One reweight -> train -> resample -> mutate pipeline iteration.
        Parity: core.py:162-185."""
        if save_every is not None:
            it = int(self.cur.iteration)
            if (it - t0) % int(save_every) == 0 and it != t0:
                self.save_sampler_state(
                    self.config.output_dir / f"{self.config.output_label}_{it}.state"
                )

        self._ensure_capacity()
        cfg = self.config

        if self._fused_iter is not None and int(self.hist.t) > 0:
            # Single-dispatch fused iteration (cluster model carried)
            if self.pbar is not None:
                self.pbar.update_iter()
            (
                self.hist,
                self.cur,
                self._fused_model,
                self._fused_fitted,
            ) = self._fused_iter(
                self._next_key(),
                self.hist,
                self.cur,
                self._fused_model,
                self._fused_fitted,
            )
            # Keep the trainer's view consistent for diagnostics (K, etc.).
            self.trainer._model = self._fused_model
            self._update_progress_bar()
            self._prune_blob_store()
            return self.get_current_dict()

        iteration = int(self.cur.iteration) + 1
        self.cur = self.cur.replace(iteration=jnp.asarray(iteration, jnp.int32))
        if self.pbar is not None:
            self.pbar.update_iter()

        # One key per iteration, split exactly as the fused iteration does
        # (fused._mutate_branch): the per-stage host loop and the fused
        # single-dispatch path then consume IDENTICAL RNG streams, so their
        # ladders/ensembles agree (tests/test_tpu_smoke.py equality gate).
        it_key = self._next_key()
        k_train, k_res, k_mut = jax.random.split(it_key, 3)

        if int(self.hist.t) == 0:
            # --- first iteration: no reweighting possible -------------
            ess0 = cfg.ess_ratio * self.n_particles
            self.cur = self.cur.replace(
                beta=jnp.asarray(0.0, self.dtype),
                logz=jnp.asarray(0.0, self.dtype),
                ess=jnp.asarray(ess0, self.dtype),
                cv=jnp.asarray(0.0, self.dtype),
            )
            self._run_warmup_mutation(it_key)
        else:
            # --- reweight ---------------------------------------------
            with annotate("ps/reweight"):
                rw = reweight_step(
                    self.hist,
                    self.cur.beta,
                    cfg.ess_ratio * self.n_particles,
                    cv_target=cfg.volume_variation or 0.0,
                    dynamic=cfg.volume_variation is not None,
                )
            self.cur = self.cur.replace(
                beta=rw.beta.astype(self.dtype),
                logz=rw.logz.astype(self.dtype),
                ess=rw.ess.astype(self.dtype),
                cv=rw.cv.astype(self.dtype),
            )

            if float(rw.beta) == 0.0:
                # Still at beta=0: the target is the prior, so train and
                # resample are skipped and fresh prior samples are drawn
                # (train.py:79-88, resample.py:68-72, mutate.py:99-149).
                self._run_warmup_mutation(it_key)
                self._update_progress_bar()
                self.hist = _commit_jit(self.hist, self.cur)
                return self.get_current_dict()

            # --- train -------------------------------------------------
            with annotate("ps/train"):
                mode_stats = self.trainer.run(
                    k_train, self.hist, rw.weights, iteration
                )

            # --- resample ---------------------------------------------
            with annotate("ps/resample"):
                u, x, logl, blobs, assignments = resample_step(
                    k_res,
                    self.hist,
                    rw.weights,
                    self.trainer.cluster_model,
                    self.n_particles,
                    method=cfg.resample,
                    clustering=cfg.clustering,
                )
            self.cur = self.cur.replace(
                u=u, x=x, logl=logl, blobs=blobs, assignments=assignments
            )

            # --- mutate ------------------------------------------------
            with annotate("ps/mutate"):
                res = self._mcmc(
                    k_mut,
                    self.cur.u, self.cur.x, self.cur.logl, self.cur.blobs,
                    self.cur.assignments, self.cur.beta, mode_stats,
                )
            self.cur = self.cur.replace(
                u=res.u, x=res.x, logl=res.logl, blobs=res.blobs,
                efficiency=res.efficiency.astype(self.dtype),
                acceptance=res.acceptance.astype(self.dtype),
                steps=res.steps,
                calls=self.cur.calls + res.n_call_sweeps,
            )
            if self.pbar is not None and self.pbar.enabled:
                self.pbar.update_stats(dict(K=int(mode_stats.n_modes())))

        self._update_progress_bar()
        self.hist = _commit_jit(self.hist, self.cur)
        self._prune_blob_store()
        return self.get_current_dict()

    def _prune_blob_store(self):
        """Garbage-collect host-side object-blob payloads whose device ids
        no longer appear in the history or the active set (rejected MCMC
        proposals). Only runs for object/string blob schemas."""
        sch = self.blob_schema
        if sch is None or not sch.is_object:
            return
        live = np.concatenate([
            fetch(self.hist.blobs).reshape(-1),
            fetch(self.cur.blobs).reshape(-1),
        ])
        sch.prune_store(live)

    def _run_warmup_mutation(self, key=None):
        """beta=0 mutation: fresh prior draws with the infinite-logl patch
        and logZ correction (mutate.py:99-149). `key` is the iteration key
        (the fused warm-up branch consumes the whole iteration key; passing
        it here keeps both paths on identical streams)."""
        wr = self._warmup(self._next_key() if key is None else key)
        self.cur = self.cur.replace(
            u=wr.u, x=wr.x, logl=wr.logl, blobs=wr.blobs,
            assignments=jnp.zeros((self.n_particles,), jnp.int32),
            logz=self.cur.logz + wr.logz_correction,
            calls=self.cur.calls + 1,  # one full-batch sweep
            steps=jnp.asarray(1, jnp.int32),
            acceptance=jnp.asarray(1.0, self.dtype),
            efficiency=jnp.asarray(1.0, self.dtype),
        )

    # ------------------------------------------------------------------
    def compute_posterior(
        self,
        resample: bool = False,
        return_blobs: bool = False,
        trim_importance_weights: bool = True,
        return_logw: bool = False,
        ess_trim: float = 0.99,
        bins_trim: int = 1000,
    ):
        """Posterior extraction. Parity: core.py:187-242.

        Host-side numpy on gathered arrays (fetch is multi-host safe): the
        extraction runs once per analysis, not per iteration, so its cost
        does not sit on the hot path.
        """
        logw, _ = compute_logw_and_logz(self.hist, 1.0)
        valid = fetch(self.hist.sample_mask()).reshape(-1)
        logw_np = fetch(logw).reshape(-1)

        # Host-side flattening of the (d, T, N) buffers into the canonical
        # (S, d) sample order (t-major). Device code never does this
        # transpose — it would break the particle-axis sharding.
        def snd(arr):  # (B, T, N) -> (S, B)
            a = np.moveaxis(fetch(arr), 0, -1)
            return a.reshape(-1, a.shape[-1])

        x = snd(self.hist.x)
        u = snd(self.hist.u)
        logl = fetch(self.hist.logl).reshape(-1)
        blobs = None
        if self.hist.blobs is not None:
            blobs = snd(self.hist.blobs)

        weights = np.exp(logw_np - np.max(logw_np[valid]))
        weights[~valid] = 0.0
        weights /= weights.sum()

        if trim_importance_weights:
            keep, w_trim = trim_weights_mask(
                jnp.asarray(weights), mask=jnp.asarray(valid), ess=ess_trim, bins=bins_trim
            )
            sel = np.asarray(keep)
            weights = np.asarray(w_trim)[sel]
        else:
            sel = valid
            weights = weights[sel]
        x, u, logl = x[sel], u[sel], logl[sel]
        logw_np = logw_np[sel]
        if blobs is not None:
            blobs = blobs[sel]

        if resample:
            idx = np.asarray(
                systematic_resample(self._next_key(), len(weights), jnp.asarray(weights))
            )
            x, u, logl = x[idx], u[idx], logl[idx]
            logw_np = logw_np[idx]
            if blobs is not None:
                blobs = blobs[idx]
            weights = np.ones(len(idx)) / len(idx)

        out = [x, weights, logl]
        if return_blobs and blobs is not None:
            out.append(self.blob_schema.unpack(blobs))
        if return_logw:
            out.append(logw_np)
        return tuple(out)

    def compute_evidence(self, n_bootstrap: int = 0):
        """(logz, logz_err). Parity: core.py:244-247 (err None by default;
        n_bootstrap > 0 adds the block-bootstrap error the reference
        lacks)."""
        if n_bootstrap > 0 and int(self.hist.t) > 0:
            from .state import bootstrap_logz_err

            err = float(
                bootstrap_logz_err(
                    self.hist, self._next_key(), n_bootstrap=int(n_bootstrap)
                )
            )
            return float(self.cur.logz), err
        return float(self.cur.logz), self.logz_err

    def compute_results(self) -> dict:
        """Full per-iteration history. Parity: state_manager.py:482-503."""
        t = int(self.hist.t)
        out = {
            "u": np.moveaxis(fetch(self.hist.u[:, :t]), 0, -1),
            "x": np.moveaxis(fetch(self.hist.x[:, :t]), 0, -1),
            "logl": fetch(self.hist.logl[:t]),
            "beta": np.asarray(self.hist.beta[:t]),
            "logz": np.asarray(self.hist.logz[:t]),
            "ess": np.asarray(self.hist.ess[:t]),
            "cv": np.asarray(self.hist.cv[:t]),
            "acceptance": np.asarray(self.hist.acceptance[:t]),
            "efficiency": np.asarray(self.hist.efficiency[:t]),
            "steps": np.asarray(self.hist.steps[:t]),
            # Device counters are in sweep units; expose raw call counts
            # (sweeps * N) in int64 so long runs never wrap.
            "calls": np.asarray(self.hist.calls[:t], dtype=np.int64) * self.n_particles,
            "iter": np.arange(1, t + 1),
        }
        if self.hist.blobs is not None:
            b = np.moveaxis(fetch(self.hist.blobs[:, :t]), 0, -1)  # (t, N, B)
            un = self.blob_schema.unpack(b.reshape(t * self.n_particles, -1))
            out["blobs"] = un.reshape((t, self.n_particles) + un.shape[1:])
        logw, _ = compute_logw_and_logz(self.hist, 1.0)
        out["logw"] = fetch(logw).reshape(-1)[
            fetch(self.hist.sample_mask()).reshape(-1)
        ]
        return out

    # ------------------------------------------------------------------
    def save_sampler_state(self, path: Union[str, Path]) -> None:
        meta = {
            "n_total": self.n_total,
            "random_state": self.config.random_state,
            "version": 1,
        }
        store = (
            self.blob_schema.store
            if self.blob_schema is not None and self.blob_schema.is_object
            else None
        )
        if jax.process_count() > 1:
            # Multi-controller job: per-host sharded checkpoint — each
            # process writes only its addressable shards (no global
            # gather; SURVEY §7.8). Object-blob stores are host-local
            # state and unsupported across controllers.
            save_checkpoint_sharded(Path(path), self.hist, self.cur, self.key, meta)
        else:
            save_checkpoint(
                Path(path), self.hist, self.cur, self.key, meta, blob_store=store
            )

    def load_sampler_state(self, path: Union[str, Path]) -> None:
        path = Path(path)
        if path.is_dir():
            if self.mesh is None:
                raise ValueError(
                    f"{path} is a per-host sharded checkpoint; construct the "
                    "Sampler with the same (or a compatible) mesh to load it."
                )
            hist, cur, key, meta = load_checkpoint_sharded(
                path, self.mesh, self.config.particle_axis
            )
            store = None
        else:
            hist, cur, key, meta, store = load_checkpoint(path, dtype=self.dtype)
        self.hist, self.cur, self.key = hist, cur, key
        if store is not None and self.blob_schema is not None:
            self.blob_schema.store = store
        if not path.is_dir():
            self._apply_sharding()
        if meta.get("n_total") is not None:
            self.n_total = meta["n_total"]

    # ------------------------------------------------------------------
    def get_current_dict(self) -> dict:
        c = self.cur
        return {
            "u": fetch(c.u),
            "x": fetch(c.x),
            "logl": fetch(c.logl),
            "blobs": None
            if c.blobs is None
            else self.blob_schema.unpack(fetch(c.blobs)),
            "assignments": fetch(c.assignments),
            "beta": float(c.beta),
            "logz": float(c.logz),
            "ess": float(c.ess),
            "cv": float(c.cv),
            "acceptance": float(c.acceptance),
            "efficiency": float(c.efficiency),
            "steps": int(c.steps),
            "calls": self.calls_total(),
            "iter": int(c.iteration),
        }

    def calls_total(self) -> int:
        """Cumulative raw likelihood calls as an exact Python integer.

        The device counter (Current.calls) is kept in sweep units — one
        sweep = one batched evaluation of all n_particles — so the int32
        buffer cannot overflow on long runs; the multiplication happens
        here in arbitrary-precision Python arithmetic.
        """
        return int(self.cur.calls) * self.n_particles

    def _update_progress_bar(self):
        if self.pbar is None or not self.pbar.enabled:
            return
        c = self.cur
        stats = dict(
            calls=self.calls_total(),
            beta=float(c.beta),
            ESS=int(float(c.ess)),
            logZ=float(c.logz),
            logL=float(jnp.mean(c.logl)),
            acc=float(c.acceptance),
            steps=int(c.steps),
            eff=float(c.efficiency),
            CV=float(c.cv),
        )
        self.pbar.update_stats(stats)
