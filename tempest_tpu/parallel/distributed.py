"""Multi-host initialization helpers.

The reference's multi-node story is an MPI pool evaluating likelihoods
(docs/user_guide/parallelization.md in the reference); here multi-host
means one JAX process per host joined into a global device mesh, with the
particle axis sharded across all chips (see mesh.py). These helpers wrap
jax.distributed with the right defaults for TPU pods.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the global JAX runtime (one call per host process).

    On TPU pods all arguments are discovered from the environment; on other
    platforms pass them explicitly. Safe to call when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(axis_name: str = "particles"):
    """1-D mesh over every device in the job (all hosts)."""
    from .mesh import make_particle_mesh

    return make_particle_mesh(axis_name=axis_name)


def is_primary() -> bool:
    """True on the process that should handle logging/checkpoint naming."""
    return jax.process_index() == 0
