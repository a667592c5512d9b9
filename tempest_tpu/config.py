"""Configuration for the TPU-native Persistent Sampling engine.

Mirrors the configuration surface of the reference implementation
(/root/reference/tempest/config.py:10-242) while adding TPU-specific knobs
(dtype policy, mesh/sharding, likelihood dispatch mode).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, List, Optional, Union

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Algorithm constants (reference: config.py:232-242)
# ---------------------------------------------------------------------------
BETA_TOLERANCE: float = 1e-4  # Absolute tolerance on beta interval (scaled)
BETA_RTOL: float = 1e-8  # Relative tolerance on beta interval
ESS_TOLERANCE: float = 0.01  # Relative tolerance on metric target
METRIC_ATOL: float = 0.5  # Absolute metric-convergence floor (ESS mode)
METRIC_ATOL_CV: float = 0.01  # Absolute metric-convergence floor (CV mode)
DOF_FALLBACK: float = 1e6  # Student-t dof fallback when EM returns non-finite
TRIM_ESS: float = 0.99  # ESS fraction preserved by weight trimming
TRIM_BINS: int = 1000  # Percentile grid size for weight trimming
MAX_BISECTION_ITERATIONS: int = 200  # Hard cap on metric bisection loop
N_PROPOSAL_CANDIDATES: int = 8  # Batched i.i.d. candidates per walker per MCMC step

# TPU-specific defaults
DEFAULT_HISTORY_CAPACITY: int = 16  # Initial T_max; grows geometrically
DEFAULT_K_MAX: int = 16  # Padded max number of clusters for fixed shapes


@dataclass(frozen=True)
class SamplerConfig:
    """Immutable, validated configuration for the TPU Persistent Sampler.

    Reference parity: tempest/config.py:10-229 (same keywords & defaults),
    plus TPU additions documented per-field.
    """

    # Required
    prior_transform: Callable
    log_likelihood: Callable
    n_dim: int

    # Sampling parameters
    n_particles: Optional[int] = None  # default: 2 * n_dim
    ess_ratio: float = 2.0
    volume_variation: Optional[float] = None  # None disables dynamic mode

    # Likelihood configuration
    log_likelihood_args: Optional[list] = None
    log_likelihood_kwargs: Optional[dict] = None
    vectorize: bool = False  # True: fns already accept (N, d) batches
    blobs_dtype: Optional[Any] = None  # dtype of auxiliary outputs, or None
    # Flattened blob width. Optional for JAX likelihoods (shape-traced with
    # no execution); declaring it for host likelihoods avoids the one real
    # inference call at construction (utils/wrappers.infer_blob_size).
    blob_size: Optional[int] = None

    # Boundary conditions (indices into [0, n_dim))
    periodic: Optional[List[int]] = None
    reflective: Optional[List[int]] = None

    # Process pool for HOST likelihoods (host_likelihood=True): int -> a
    # spawned multiprocessing pool, object with .map -> used directly (e.g.
    # an MPI pool), mirroring the reference's dispatch (core.py:430-440).
    # For JAX likelihoods parallelism comes from the device mesh instead,
    # and pool is accepted-but-ignored (with a warning) for compatibility.
    pool: Optional[Union[int, Any]] = None

    # Clustering
    clustering: bool = True
    normalize: bool = True
    cluster_every: int = 1
    split_threshold: float = 1.0
    n_max_clusters: Optional[int] = None

    # Algorithm parameters
    sample: str = "tpcn"  # "tpcn" | "rwm"
    n_steps: Optional[int] = None  # base MCMC steps/dim; default 1
    n_max_steps: Optional[int] = None  # max MCMC steps/dim; default 20*n_steps
    resample: str = "mult"  # "mult" | "syst"

    # Output
    output_dir: Optional[Path] = None
    output_label: Optional[str] = None

    # Random seed
    random_state: Optional[int] = None

    # ---- TPU-native additions -------------------------------------------
    dtype: Any = jnp.float32  # compute dtype for particle state
    host_likelihood: bool = False  # wrap non-JAX likelihood via pure_callback
    mesh: Any = None  # optional jax.sharding.Mesh; None = single device
    particle_axis: str = "particles"  # mesh axis name for particle sharding
    history_capacity: int = DEFAULT_HISTORY_CAPACITY
    # True (the default unless the user passes an explicit
    # history_capacity) lets run() pre-grow the history to an
    # n_total-derived estimate BEFORE the first compile, so a typical
    # annealing never hits the capacity wall mid-run. Growth re-specializes
    # every jitted program on the new shapes — a cold whole-run fused
    # compile is minutes on a remote TPU — so one generous upfront
    # allocation beats a guaranteed mid-run doubling (the old default of
    # 16 slots forced one on essentially every real problem).
    auto_capacity: bool = True
    k_max: int = DEFAULT_K_MAX  # padded cluster-count cap for fixed shapes
    donate_state: bool = True  # donate buffers to jitted steps
    # False disables the fused single-dispatch iteration in favor of the
    # per-stage host loop (one device program per pipeline stage) — slower,
    # but each stage is separately profileable/debuggable.
    fused: bool = True
    # Batched i.i.d. proposal candidates per walker per MCMC step (the
    # bounded replacement for the reference's redraw-until-in-bounds loop,
    # mcmc.py:239-249 there). Raise it for heavily bounded problems where
    # walkers sit against walls with large step sizes.
    n_candidates: int = N_PROPOSAL_CANDIDATES
    # Geometry fits (hierarchical GMM + per-mode Student-t) run on a
    # weighted subsample of the trimmed history once it exceeds this many
    # points. The trimmed history carries only ~ess_ratio*n_particles
    # effective samples during annealing, so a subsample several times
    # that size changes the fits only at Monte-Carlo-noise level while
    # cutting the EM cost by T_max*N/train_max_points (the clustered
    # path's dominant term; see benchmarks/results/kernel_times_tpu.txt).
    # None = auto (max(4096, 4*n_particles)); 0 disables subsampling.
    train_max_points: Optional[int] = None
    # Per-LEAF cap on the hierarchical-GMM EM fit sets: each leaf's K=1/K=2
    # EM runs on its own top-leaf_fit_points members by weight ((k_max,
    # n_sub) tensors instead of (k_max, n) — the clustered path's dominant
    # HBM term), while the BIC split gate and child relabeling stay on the
    # FULL membership via one density pass at the final parameters. Leaves
    # with fewer members fit on exactly their member set (zero-weight
    # padding is inert in the weighted EM): K=1 fits are then identical to
    # the full-width fit; K=2 fits are statistically equivalent (top_k
    # reorders rows, so the k-means++ inverse-CDF init draws a different,
    # equally distributed point). None = auto (train_max_points // 2 — measured as
    # the safe truncation: half the fit set keeps the mode-discovery and
    # logZ behavior of the full fit on the 10-D bimodal validation, while
    # a quarter loses modes because the top-by-weight subset of a leaf
    # whose effective sample size rivals the cap can lopsidedly favor one
    # mode). 0 disables the per-leaf cap.
    leaf_fit_points: Optional[int] = None
    # run(on_device=True) dispatch budget in SECONDS: the whole-run device
    # loop is re-entered from the host in chunks sized so one dispatch
    # stays under this wall-clock bound. Relayed TPU workers kill single
    # executions past ~a minute (an execution-length watchdog, measured
    # in round 4 — the real cause of the "multi-GiB history" crashes);
    # small problems still complete in ONE dispatch because the chunk is
    # sized from a per-iteration estimate. Chunk boundaries change
    # neither the RNG stream nor any computed value. None = never chunk
    # (single dispatch, for backends without execution limits).
    on_device_dispatch_budget_s: Optional[float] = 45.0
    # Draw the mutation kernel's normal candidates and gamma mixture
    # scales from the TPU's HARDWARE PRNG (Pallas bits + paired Box-Muller
    # / Marsaglia-Tsang, ops/pallas_prng.py) instead of threefry.
    # Statistically equivalent but a DIFFERENT RNG stream: leave off
    # (default) to preserve bit-exact replays of existing runs. Measured
    # at N=2^18: normal candidates 0.711 -> 0.342 ms, gamma scales
    # 0.835 -> 0.037 ms — RNG drops from ~19% to <5% of the tpCN step.
    # Ignored (threefry fallback) off-TPU or for non-float32 dtypes.
    hardware_prng: bool = False
    # Hierarchical-clustering split cadence. True (default) splits every
    # BIC-eligible leaf per round (standard bisecting k-means: K leaves in
    # ~log2(K) rounds — measured ~1.7x faster end-to-end on the clustered
    # flagship at identical evidence/mode recovery). False reproduces the
    # reference's cadence exactly: one best-improvement leaf per round
    # (cluster.py:445-521 there), K-1 rounds. The per-leaf BIC gates and
    # min_points rules are identical either way; only the split ORDER
    # differs, which matters when k_max caps the leaf count.
    split_all: bool = True

    def __post_init__(self) -> None:
        if not isinstance(self.n_dim, int):
            raise ValueError(f"n_dim must be int, got {type(self.n_dim).__name__}")

        if self.output_dir is None:
            object.__setattr__(self, "output_dir", Path("states"))
        elif isinstance(self.output_dir, str):
            object.__setattr__(self, "output_dir", Path(self.output_dir))

        if self.output_label is None:
            object.__setattr__(self, "output_label", "ps")

        if self.n_particles is None:
            object.__setattr__(self, "n_particles", 2 * self.n_dim)

        if self.n_steps is None or self.n_steps <= 0:
            object.__setattr__(self, "n_steps", 1)
        if self.n_max_steps is None or self.n_max_steps <= 0:
            object.__setattr__(self, "n_max_steps", 20 * self.n_steps)

        if self.n_max_clusters is not None:
            object.__setattr__(self, "k_max", max(1, int(self.n_max_clusters)))

        if self.train_max_points is None:
            object.__setattr__(
                self, "train_max_points", max(4096, 4 * self.n_particles)
            )

        if self.leaf_fit_points is None:
            object.__setattr__(
                self,
                "leaf_fit_points",
                self.train_max_points // 2 if self.train_max_points else 0,
            )

        self.validate()

        if self.pool is not None and not self.host_likelihood:
            warnings.warn(
                "pool is ignored for JAX likelihoods: parallelism comes from "
                "sharding the particle axis over the device mesh (pass mesh=...). "
                "It IS honored together with host_likelihood=True.",
                UserWarning,
                stacklevel=2,
            )

        if self.volume_variation is not None and self.n_particles < self.n_dim + 1:
            warnings.warn(
                f"For dynamic mode, n_particles ({self.n_particles}) should be "
                f">= n_dim + 1 ({self.n_dim + 1}) for reliable results.",
                UserWarning,
                stacklevel=2,
            )

    def validate(self) -> None:
        """Check every field; collect all problems and raise once.

        Same rules as the reference (config.py:98-185) expressed in our own
        structure: a table of (predicate, message) pairs evaluated in one
        pass, so a bad config reports every violation at once instead of
        failing on the first.
        """
        problems: List[str] = []

        def need(ok: bool, msg: str) -> bool:
            if not ok:
                problems.append(msg)
            return ok

        need(callable(self.prior_transform), "prior_transform is not callable")
        need(callable(self.log_likelihood), "log_likelihood is not callable")
        need(
            isinstance(self.n_dim, int) and self.n_dim > 0,
            f"n_dim should be a positive integer (got {self.n_dim!r})",
        )

        if need(
            isinstance(self.n_particles, int),
            f"n_particles should be an integer (got {type(self.n_particles).__name__})",
        ):
            need(
                self.n_particles > 0,
                f"n_particles should be > 0 (got {self.n_particles})",
            )

        if need(
            isinstance(self.ess_ratio, (int, float)),
            f"ess_ratio should be a number (got {type(self.ess_ratio).__name__})",
        ):
            need(self.ess_ratio > 0, f"ess_ratio should be > 0 (got {self.ess_ratio})")

        if self.volume_variation is not None:
            if need(
                isinstance(self.volume_variation, (int, float)),
                "volume_variation should be a number or None "
                f"(got {type(self.volume_variation).__name__})",
            ):
                need(
                    self.volume_variation > 0,
                    f"volume_variation should be > 0 (got {self.volume_variation})",
                )

        need(
            self.sample in ("tpcn", "rwm"),
            f"unknown sample kernel {self.sample!r} — choose 'tpcn' or 'rwm'",
        )
        need(
            self.resample in ("mult", "syst"),
            f"unknown resample scheme {self.resample!r} — choose 'mult' or 'syst'",
        )
        need(
            not (self.vectorize and self.blobs_dtype is not None),
            "blobs require per-particle likelihood calls; drop vectorize=True "
            "or blobs_dtype",
        )

        if self.periodic is not None and self.reflective is not None:
            shared = sorted(set(self.periodic) & set(self.reflective))
            need(
                not shared,
                f"dimensions {shared} appear as both periodic and reflective — "
                "each index may use at most one boundary type",
            )

        for kind in ("periodic", "reflective"):
            idx = getattr(self, kind)
            if idx is None:
                continue
            bad = [i for i in idx if not (isinstance(i, int) and 0 <= i < self.n_dim)]
            need(
                not bad,
                f"{kind} contains out-of-range or non-integer entries {bad}; "
                f"valid dimension indices are 0..{self.n_dim - 1}",
            )

        need(
            isinstance(self.output_dir, Path),
            f"output_dir should be a Path (got {type(self.output_dir).__name__})",
        )
        need(
            self.output_label is None or isinstance(self.output_label, str),
            f"output_label should be a string (got {type(self.output_label).__name__})",
        )

        if problems:
            listing = "\n".join(f"  * {p}" for p in problems)
            raise ValueError(f"Invalid SamplerConfig ({len(problems)} problem(s)):\n{listing}")

    def get_target_metric(self) -> float:
        """Target metric: CV in dynamic mode, else ess_ratio * n_particles."""
        if self.volume_variation is not None:
            return self.volume_variation
        return self.ess_ratio * self.n_particles
