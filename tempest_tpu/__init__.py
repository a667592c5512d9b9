"""tempest_tpu — a TPU-native Persistent Sampling engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Persistent Sampling library (Karamanis & Seljak 2025,
arXiv:2407.20722): adaptive temperature-ladder SMC with persistent
multiple-importance-sampling reweighting over all historical particles,
clustered Student-t-preconditioned Crank-Nicolson (or random-walk
Metropolis) mutation, and evidence (logZ) estimation — with every array
operation jitted and the particle ensemble shardable over a TPU mesh.
"""

__version__ = "0.1.0"

__all__ = ["Sampler"]


def __getattr__(name):
    # Lazy import keeps `import tempest_tpu.ops...` cheap and avoids pulling
    # the full sampler stack (and jax compilation) for utility-only users.
    if name == "Sampler":
        from .sampler import Sampler

        return Sampler
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
