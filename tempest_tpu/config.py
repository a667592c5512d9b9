"""Configuration for the TPU-native Persistent Sampling engine.

Mirrors the configuration surface of the reference implementation
(/root/reference/tempest/config.py:10-242) while adding TPU-specific knobs
(dtype policy, mesh/sharding, likelihood dispatch mode).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, List, Optional, Sequence, Union

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
    k_max: int = DEFAULT_K_MAX  # padded cluster-count cap for fixed shapes
    donate_state: bool = True  # donate buffers to jitted steps

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
        """Validate all parameters; raise ValueError listing every problem."""
        errors = []

        if not callable(self.prior_transform):
            errors.append("prior_transform must be callable")
        if not callable(self.log_likelihood):
            errors.append("log_likelihood must be callable")
        if not isinstance(self.n_dim, int) or self.n_dim <= 0:
            errors.append(f"n_dim must be positive int, got {self.n_dim}")

        if not isinstance(self.n_particles, int):
            errors.append(f"n_particles must be int, got {type(self.n_particles)}")
        elif self.n_particles <= 0:
            errors.append(f"n_particles must be positive integer, got {self.n_particles}")

        if not isinstance(self.ess_ratio, (int, float)):
            errors.append(f"ess_ratio must be numeric, got {type(self.ess_ratio)}")
        elif self.ess_ratio <= 0:
            errors.append(f"ess_ratio must be positive, got {self.ess_ratio}")

        if self.volume_variation is not None:
            if not isinstance(self.volume_variation, (int, float)):
                errors.append(
                    f"volume_variation must be numeric or None, got {type(self.volume_variation)}"
                )
            elif self.volume_variation <= 0:
                errors.append(f"volume_variation ({self.volume_variation}) must be positive")

        if self.sample not in ("tpcn", "rwm"):
            errors.append(f"Invalid sampler '{self.sample}': must be 'tpcn' or 'rwm'")

        if self.resample not in ("mult", "syst"):
            errors.append(f"Invalid resample '{self.resample}': must be 'mult' or 'syst'")

        if self.vectorize and self.blobs_dtype is not None:
            errors.append("Cannot vectorize likelihood with blobs")

        if self.periodic is not None and self.reflective is not None:
            overlap = set(self.periodic).intersection(set(self.reflective))
            if overlap:
                errors.append(f"Parameters cannot be both periodic and reflective: {overlap}")

        for name, lst in (("periodic", self.periodic), ("reflective", self.reflective)):
            if lst is not None and not all(
                isinstance(i, int) and 0 <= i < self.n_dim for i in lst
            ):
                errors.append(
                    f"{name} indices must be integers in [0, {self.n_dim - 1}], got {lst}"
                )

        if not isinstance(self.output_dir, Path):
            errors.append(f"output_dir must be Path, got {type(self.output_dir)}")
        if self.output_label is not None and not isinstance(self.output_label, str):
            errors.append(f"output_label must be str or None, got {type(self.output_label)}")

        if errors:
            raise ValueError(
                "Configuration validation failed:\n"
                + "\n".join(f"  - {err}" for err in errors)
            )

    def get_target_metric(self) -> float:
        """Target metric: CV in dynamic mode, else ess_ratio * n_particles."""
        if self.volume_variation is not None:
            return self.volume_variation
        return self.ess_ratio * self.n_particles
