"""Public Sampler facade.

Drop-in analogue of /root/reference/tempest/sampler.py:12-406: the same
constructor keywords, run/sample/posterior/evidence/save_state/load_state/
results methods and read-only properties — backed by the TPU-native core.
Model functions (`prior_transform`, `log_likelihood`) are JAX functions
vmapped over the particle axis (set vectorize=True if they already accept
batches, or host_likelihood=True to bridge non-JAX code via pure_callback).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

from .config import SamplerConfig
from .core import SamplerCore


class Sampler:
    """Persistent Sampling on TPU.

    Parameters mirror the reference API (sampler.py:22-119); TPU-specific
    extras: dtype, host_likelihood, mesh, k_max, history_capacity.
    """

    def __init__(
        self,
        prior_transform: callable,
        log_likelihood: callable,
        n_dim: int,
        n_particles: Optional[int] = None,
        ess_ratio: float = 2.0,
        volume_variation: Optional[float] = None,
        log_likelihood_args: Optional[list] = None,
        log_likelihood_kwargs: Optional[dict] = None,
        vectorize: bool = False,
        blobs_dtype: Optional[str] = None,
        periodic: Optional[list] = None,
        reflective: Optional[list] = None,
        pool: Optional[Union[int, object]] = None,
        clustering: bool = True,
        normalize: bool = True,
        cluster_every: int = 1,
        split_threshold: float = 1.0,
        n_max_clusters: Optional[int] = None,
        sample: str = "tpcn",
        n_steps: Optional[int] = None,
        n_max_steps: Optional[int] = None,
        resample: str = "mult",
        output_dir: Optional[str] = None,
        output_label: Optional[str] = None,
        random_state: Optional[int] = None,
        # TPU-native extras
        dtype=None,
        host_likelihood: bool = False,
        mesh=None,
        k_max: Optional[int] = None,
        history_capacity: Optional[int] = None,
        blob_size: Optional[int] = None,
        n_candidates: Optional[int] = None,
        train_max_points: Optional[int] = None,
        split_all: Optional[bool] = None,
        fused: Optional[bool] = None,
        leaf_fit_points: Optional[int] = None,
        on_device_dispatch_budget_s: Optional[float] = -1.0,
        hardware_prng: bool = False,
        donate_state: bool = True,
    ):
        import jax.numpy as jnp

        extra = {}
        if dtype is not None:
            extra["dtype"] = dtype
        if k_max is not None:
            extra["k_max"] = k_max
        if history_capacity is not None:
            extra["history_capacity"] = history_capacity
            extra["auto_capacity"] = False  # user-fixed; run() won't pre-grow
        if blob_size is not None:
            extra["blob_size"] = blob_size
        if n_candidates is not None:
            extra["n_candidates"] = n_candidates
        if train_max_points is not None:
            extra["train_max_points"] = train_max_points
        if split_all is not None:
            extra["split_all"] = split_all
        if fused is not None:
            extra["fused"] = fused
        if leaf_fit_points is not None:
            extra["leaf_fit_points"] = leaf_fit_points
        if hardware_prng:
            extra["hardware_prng"] = True
        if not donate_state:
            # Escape hatch for buffer-donation issues on untested
            # backend/mesh combinations (docs/user_guide/
            # parameter_selection_advanced.md); costs a second resident
            # history copy in the fused programs.
            extra["donate_state"] = False
        # Sentinel -1.0 = "use the config default"; None is a meaningful
        # user value here (disable chunking entirely). Any other negative
        # is a typo, not a request for the default.
        if on_device_dispatch_budget_s is None or on_device_dispatch_budget_s >= 0:
            extra["on_device_dispatch_budget_s"] = on_device_dispatch_budget_s
        elif on_device_dispatch_budget_s != -1.0:
            raise ValueError(
                "on_device_dispatch_budget_s must be a non-negative number of "
                "seconds, None (disable chunking), or the -1.0 sentinel for "
                f"the config default; got {on_device_dispatch_budget_s!r}"
            )

        config = SamplerConfig(
            prior_transform=prior_transform,
            log_likelihood=log_likelihood,
            n_dim=n_dim,
            n_particles=n_particles,
            ess_ratio=ess_ratio,
            volume_variation=volume_variation,
            log_likelihood_args=log_likelihood_args,
            log_likelihood_kwargs=log_likelihood_kwargs,
            vectorize=vectorize,
            blobs_dtype=blobs_dtype,
            periodic=periodic,
            reflective=reflective,
            pool=pool,
            clustering=clustering,
            normalize=normalize,
            cluster_every=cluster_every,
            split_threshold=split_threshold,
            n_max_clusters=n_max_clusters,
            sample=sample,
            n_steps=n_steps,
            n_max_steps=n_max_steps,
            resample=resample,
            output_dir=output_dir,
            output_label=output_label,
            random_state=random_state,
            host_likelihood=host_likelihood,
            mesh=mesh,
            **extra,
        )
        self._core = SamplerCore(config)

    # ------------------------------------------------------------------
    def run(
        self,
        n_total: int = 4096,
        progress: bool = True,
        resume_state_path: Union[str, Path, None] = None,
        save_every: Optional[int] = None,
        on_device: bool = False,
    ):
        """Run Persistent Sampling until beta reaches 1 and the posterior
        ESS reaches n_total. Parity: sampler.py:163-193.

        on_device=True compiles the whole annealing loop into one device
        program (requires clustering=False and save_every=None)."""
        return self._core.run_sampling(
            n_total=n_total,
            progress=progress,
            resume_state_path=resume_state_path,
            save_every=save_every,
            on_device=on_device,
        )

    def sample(self, save_every: Optional[int] = None, t0: int = 0) -> dict:
        """Perform a single PS iteration. Parity: sampler.py:195-214."""
        return self._core.execute_iteration(save_every=save_every, t0=t0)

    def posterior(
        self,
        resample: bool = False,
        return_blobs: bool = False,
        trim_importance_weights: bool = True,
        return_logw: bool = False,
        ess_trim: float = 0.99,
        bins_trim: int = 1000,
    ) -> tuple:
        """Posterior samples (x, weights, logl[, blobs][, logw]).
        Parity: sampler.py:216-263."""
        return self._core.compute_posterior(
            resample=resample,
            return_blobs=return_blobs,
            trim_importance_weights=trim_importance_weights,
            return_logw=return_logw,
            ess_trim=ess_trim,
            bins_trim=bins_trim,
        )

    def evidence(self, n_bootstrap: int = 0):
        """(logz, logz_err). Parity: sampler.py:265-276.

        The reference always returns logz_err=None; pass n_bootstrap > 0
        (e.g. 256) to estimate it with an on-device iteration-block
        bootstrap over the MIS history (state.bootstrap_logz_err) — the
        default keeps exact reference behavior.
        """
        return self._core.compute_evidence(n_bootstrap=n_bootstrap)

    def save_state(self, path: Union[str, Path]):
        self._core.save_sampler_state(Path(path))

    def load_state(self, path: Union[str, Path]):
        self._core.load_sampler_state(Path(path))

    def results(self) -> dict:
        """Full per-iteration history + final log-weights."""
        return self._core.compute_results()

    def reset(self, random_state=None):
        """Clear state for a fresh run, keeping compiled kernels."""
        self._core.reset(random_state=random_state)

    # ------------------------------------------------------------------
    # Pickling: parity with reference sampler.py:300-306 (which strips the
    # process pool). Compiled kernels and the mesh are dropped; arrays are
    # pulled to host. Unpickling rebuilds the core (kernels recompile
    # lazily) and restores the exact run state, including the RNG stream.
    def __getstate__(self):
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        core = self._core
        # Strip the mesh AND the pool (reference sampler.py:300-306 strips
        # its pool): neither is picklable in general.
        config = dataclasses.replace(core.config, mesh=None, pool=None)

        from .utils.host import fetch_tree as to_host

        import jax

        key = core.key
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key_data, key_typed = np.asarray(jax.random.key_data(key)), True
        else:
            key_data, key_typed = np.asarray(key), False
        return {
            "config": config,
            "hist": to_host(core.hist),
            "cur": to_host(core.cur),
            "key_data": key_data,
            "key_typed": key_typed,
            "n_total": core.n_total,
        }

    def __setstate__(self, state):
        import jax
        import jax.numpy as jnp

        self._core = SamplerCore(state["config"])
        as_dev = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
        self._core.hist = as_dev(state["hist"])
        self._core.cur = as_dev(state["cur"])
        key = jnp.asarray(state["key_data"])
        if state["key_typed"]:
            key = jax.random.wrap_key_data(key)
        self._core.key = key
        self._core.n_total = state["n_total"]

    # ------------------------------------------------------------------
    @property
    def n_dim(self) -> int:
        return self._core.config.n_dim

    @property
    def n_particles(self) -> int:
        return self._core.config.n_particles

    @property
    def ess_ratio(self) -> float:
        return self._core.config.ess_ratio

    @property
    def volume_variation(self) -> Optional[float]:
        return self._core.config.volume_variation

    @property
    def n_steps(self) -> int:
        return self._core.config.n_steps

    @property
    def n_max_steps(self) -> int:
        return self._core.config.n_max_steps

    @property
    def n_total(self) -> Optional[int]:
        return self._core.n_total

    @property
    def resample(self) -> str:
        return self._core.config.resample

    @property
    def clustering(self) -> bool:
        return self._core.config.clustering

    @property
    def vectorize(self) -> bool:
        return self._core.config.vectorize

    @property
    def output_dir(self) -> Path:
        return self._core.config.output_dir

    @property
    def output_label(self) -> str:
        return self._core.config.output_label

    @property
    def random_state(self) -> Optional[int]:
        return self._core.config.random_state

    @property
    def periodic(self) -> Optional[list]:
        return self._core.config.periodic

    @property
    def reflective(self) -> Optional[list]:
        return self._core.config.reflective

    @property
    def beta(self) -> float:
        return float(self._core.cur.beta)

    @property
    def logz(self) -> float:
        return float(self._core.cur.logz)

    @property
    def ess(self) -> float:
        return float(self._core.cur.ess)

    @property
    def cv(self) -> Optional[float]:
        return float(self._core.cur.cv)

    @property
    def calls(self) -> int:
        return self._core.calls_total()

    @property
    def state(self):
        """Access to internal state (history/current) for diagnostics."""
        return self._core
