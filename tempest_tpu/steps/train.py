"""Training step: fit the clusterer and build per-mode Student-t statistics.

TPU redesign of /root/reference/tempest/steps/train.py:12-127. Weight
trimming and the per-mode Student-t EM fits are jitted fixed-shape kernels
(see ops.tools.trim_weights_mask and modes.fit_mode_statistics); only the
hierarchical split decisions run on the host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..cluster import (
    ClusterModel,
    HierarchicalGaussianMixture,
    cluster_predict,
    single_cluster_model,
)
from ..config import TRIM_BINS, TRIM_ESS
from ..modes import ModeStatistics, fit_global_mode, fit_mode_statistics
from ..ops.tools import trim_weights_mask
from ..state import History


class Trainer:
    """Fits clustering + mode statistics each iteration.

    Holds the (mutable) HierarchicalGaussianMixture instance shared with the
    resampler, mirroring the shared-clusterer wiring of core.py:57-89.
    """

    def __init__(
        self,
        n_dim: int,
        k_max: int,
        clustering: bool = True,
        cluster_every: int = 1,
        normalize: bool = True,
        split_threshold: float = 1.0,
        n_max_clusters: Optional[int] = None,
        dof_fallback: float = 1e6,
        resample_factor: int = 4,
        n_particles: int = 256,
        dtype=jnp.float32,
        train_max_points: int = 0,
        split_all: bool = False,
        leaf_fit_points: Optional[int] = None,
    ):
        self.n_dim = n_dim
        self.k_max = k_max
        self.clustering = clustering
        self.cluster_every = cluster_every
        self.dof_fallback = dof_fallback
        self.dtype = dtype
        self.train_max_points = train_max_points
        self.clusterer = None
        if clustering:
            self.clusterer = HierarchicalGaussianMixture(
                split_all=split_all,
                n_init=1,
                max_iterations=1000 if n_max_clusters is None else n_max_clusters - 1,
                min_points=None if n_max_clusters is None else 4 * n_dim,
                threshold_modifier=split_threshold,
                covariance_type="full",
                normalize=normalize,
                k_max=k_max,
                leaf_fit_points=leaf_fit_points or None,
            )
        self._model: ClusterModel = single_cluster_model(n_dim, k_max, dtype)

    @property
    def cluster_model(self) -> ClusterModel:
        return self._model

    def run(
        self,
        key: jax.Array,
        hist: History,
        weights: jnp.ndarray,
        iteration: int,
    ) -> ModeStatistics:
        """Trim weights, (re)fit clustering, fit per-mode Student-t stats.

        Parity: train.py:65-127. Caller handles the beta=0 dummy-stats path.
        """
        N = hist.n_particles
        S = hist.capacity * N
        keep_mask, w_trim = trim_weights_mask(
            weights.reshape(-1),
            mask=hist.sample_mask().reshape(-1),
            ess=TRIM_ESS,
            bins=TRIM_BINS,
        )

        # Top-by-weight selection for the geometry fits (see config
        # train_max_points and the same logic in fused._mutate_branch).
        m_cap = self.train_max_points
        if m_cap and m_cap < S:
            w_fit, idx = jax.lax.top_k(w_trim, m_cap)
            # Flattened single-axis gather — the (t, n) 2-axis form makes
            # XLA:TPU materialize layout-transposed full-history copies
            # (see state.gather_history).
            u_fit = hist.u.reshape(self.n_dim, -1)[:, idx].T
            keep_fit = w_fit > 0.0
        else:
            u_fit = hist.u.reshape(self.n_dim, -1).T  # (S, d)
            w_fit, keep_fit = w_trim, keep_mask

        if self.clustering:
            refit = iteration % self.cluster_every == 0 or iteration == 0
            if refit or self.clusterer.model is None:
                self.clusterer.fit(u_fit, w_fit, mask=keep_fit)
                self._model = self.clusterer.model
            # Device-native predict — the class method would round-trip the
            # (T*N,) label array through the host on every iteration.
            labels = cluster_predict(self._model, u_fit)
            return fit_mode_statistics(
                u_fit, w_fit, labels, k_max=self.k_max, dof_fallback=self.dof_fallback
            )
        return fit_global_mode(u_fit, w_fit, dof_fallback=self.dof_fallback)
