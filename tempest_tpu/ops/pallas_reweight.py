"""Pallas TPU kernel: the whole ESS-mode temperature bisection in VMEM.

The ESS-mode ladder search evaluates ESS(beta) at ~30-60 trial betas, and
each XLA-lowered probe is a chain of reduce-window kernels over the S-sized
history (observed ~0.5ms/probe inside the fused-run while loops). The data
a probe needs — logl (S,) and the masked MIS denominator (S,) — is ~1MB:
it fits in VMEM. This kernel loads both ONCE and runs the complete
bisection (the same dual-tolerance convergence rules as
steps/reweight._find_beta_bisection, reference reweight.py:120-223) as a
register/VMEM-resident loop: per probe

    ESS(beta) = s1^2 / s2,  s1 = sum exp(x - m), s2 = sum exp(2(x - m)),
    x = beta*logl - Bm,     m = max(x)

with zero HBM traffic after the initial load.

Used for the ESS mode only (dynamic/CV mode needs the particle matrix for
volume_variation and stays on the XLA path), gated on a TPU-family backend
and on the history fitting in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    BETA_RTOL,
    BETA_TOLERANCE,
    ESS_TOLERANCE,
    MAX_BISECTION_ITERATIONS,
    METRIC_ATOL,
)

_LANES = 128
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024  # logl + Bm + headroom for temporaries


def pallas_supported(n_samples: int, dtype) -> bool:
    """Static gate: TPU-family backend, float32, history fits in VMEM."""
    if dtype != jnp.float32:
        return False
    if 2 * 4 * n_samples > _VMEM_BUDGET_BYTES:
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:  # pragma: no cover
        return False
    return backend in ("tpu", "axon")


def _kernel(scal_ref, logl_ref, bm_ref, out_ref):
    beta_prev = scal_ref[0]
    target = scal_ref[1]
    logl = logl_ref[:]
    bm = bm_ref[:]
    one = jnp.float32(1.0)

    def ess_at(beta):
        x = beta * logl - bm
        m = jnp.max(x)
        e = jnp.exp(x - m)
        s1 = jnp.sum(e)
        s2 = jnp.sum(e * e)
        return (s1 * s1) / s2

    def interval_tol(lo, hi):
        scale = jnp.maximum(
            jnp.maximum(jnp.abs(lo), jnp.abs(hi)), jnp.float32(1e-38)
        )
        return jnp.maximum(BETA_RTOL * scale, BETA_TOLERANCE * scale)

    ess_cur = ess_at(beta_prev)
    ess_one = ess_at(one)

    def cond(c):
        return (~c["done"]) & (c["i"] < MAX_BISECTION_ITERATIONS)

    def body(c):
        lo, hi = c["lo"], c["hi"]
        beta = 0.5 * (lo + hi)
        metric = ess_at(beta)
        metric = jnp.where(jnp.isfinite(metric), metric, jnp.float32(1e10))
        metric_conv = jnp.abs(metric - target) < jnp.maximum(
            ESS_TOLERANCE * jnp.abs(target), jnp.float32(METRIC_ATOL)
        )
        beta_conv = (hi - lo) < interval_tol(lo, hi)
        done = metric_conv | beta_conv | (beta == one)
        go_up = metric >= target  # ESS decreases with beta
        lo = jnp.where((~done) & go_up, beta, lo)
        hi = jnp.where((~done) & (~go_up), beta, hi)
        return {"lo": lo, "hi": hi, "beta": beta, "i": c["i"] + 1, "done": done}

    init = {
        "lo": beta_prev,
        "hi": one,
        "beta": 0.5 * (beta_prev + one),
        "i": jnp.int32(0),
        "done": (ess_cur <= target) | (ess_one >= target),
    }
    out = jax.lax.while_loop(cond, body, init)

    beta = jnp.where(
        ess_cur <= target,
        beta_prev,
        jnp.where(ess_one >= target, one, out["beta"]),
    )
    out_ref[0] = beta


@partial(jax.jit, static_argnames=("interpret",))
def ess_bisect_beta(
    logl_flat: jnp.ndarray,
    bm_flat: jnp.ndarray,
    beta_prev,
    ess_target,
    interpret: bool = False,
) -> jnp.ndarray:
    """Next inverse temperature for ESS mode, computed fully in VMEM.

    logl_flat: (S,) log-likelihoods; bm_flat: (S,) masked denominator
    (+inf on invalid slots so their weight is exactly zero).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = logl_flat.shape[0]
    rows = -(-S // _LANES)
    pad = rows * _LANES - S
    if pad:
        logl_flat = jnp.concatenate(
            [logl_flat, jnp.zeros((pad,), logl_flat.dtype)]
        )
        bm_flat = jnp.concatenate(
            [bm_flat, jnp.full((pad,), jnp.inf, bm_flat.dtype)]
        )
    logl2 = logl_flat.reshape(rows, _LANES)
    bm2 = bm_flat.reshape(rows, _LANES)
    scal = jnp.stack(
        [jnp.asarray(beta_prev, jnp.float32), jnp.asarray(ess_target, jnp.float32)]
    )

    beta = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(scal, logl2, bm2)
    return beta[0]
