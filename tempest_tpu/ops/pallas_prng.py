"""Hardware-PRNG draw kernels (Pallas TPU): normals, uniforms, gammas.

Large-ensemble mutation is partially RNG-bound: at N=2^18 the threefry
normal candidates (0.695 ms) plus the rejection-sampled gamma mixture
scale (1.103 ms) are ~19% of the measured tpCN step
(benchmarks/results/mutation_roofline.json). Threefry pays a counter-mode
block cipher per 32 bits of entropy; the TPU has a hardware PRNG exposed
through `pltpu.prng_seed`/`pltpu.prng_random_bits` that removes that
compute entirely:

- `hw_normal(key, shape)` — one Pallas kernel, gridded over row-blocks;
  each instance seeds the per-core PRNG with (key_word0, key_word1,
  program_id) and applies Box-Muller in-kernel, so only the final
  normals ever touch HBM (half the bytes of a uniform-pair approach).
- `hw_uniform(key, shape)` — raw bits kernel + exponent-splice to (0, 1]
  in XLA (fuses into the consumer).
- `hw_gamma(key, alpha)` — Marsaglia-Tsang with a fixed unrolled round
  count over hardware normal/uniform draws, with the alpha < 1 boost
  (gamma(a) = gamma(a+1) * U^(1/a)). Used for the tpCN inverse-gamma
  mixture scale, where per-walker shapes are (n_dim + dof)/2.

These draws are STATISTICALLY equivalent to the `jax.random` threefry
path, not bit-compatible: the `hardware_prng` config flag (default off)
documents that a run with it enabled has a different — equally valid —
RNG stream, so bit-exact replays of flag-off runs are preserved.

Reference parity anchor: the draws replace `jax.random.normal`
(mcmc.py:169 here; reference mcmc.py:225-231) and `jax.random.gamma`
(mcmc.py:257 here; reference mcmc.py:233-236).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_BLOCK_ROWS = 512  # 512x128 f32 = 256 KB per grid instance's output block
_TWO_PI = 6.283185307179586
_MT_ROUNDS = 6  # Marsaglia-Tsang acceptance is >=96%/round for alpha>=1


def hw_prng_supported(dtype) -> bool:
    """Static gate: TPU-family backend and float32 draws."""
    if dtype != jnp.float32:
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:  # pragma: no cover
        return False
    return backend in ("tpu", "axon")


def _seed_words(key) -> jnp.ndarray:
    """(2,) int32 seed words from a jax PRNG key (new-style or legacy)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    data = data.reshape(-1)[:2].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(data, jnp.int32)


def _unit_open_closed(bits_u32):
    """uint32 bits -> float32 in (0, 1]: splice the top 23 bits into the
    mantissa of [1, 2), subtract from 2 so 0-mantissa maps to 1.0 and the
    result is never 0 (safe under log)."""
    f = jax.lax.bitcast_convert_type(
        jnp.uint32(0x3F800000) | (bits_u32 >> jnp.uint32(9)), jnp.float32
    )
    return 2.0 - f


# Per-instance stream separation: program_id is mixed into seed word 0
# with a Weyl-sequence constant (the 3-argument prng_seed form trips a
# Mosaic "UNKNOWN SSA VALUE" compile bug on this toolchain — probed).
_WEYL = -1640531527  # int32 of 0x9E3779B9 (golden-ratio increment)


def _normal_kernel(seed_ref, out_ref):
    """PAIRED Box-Muller: one (log, sqrt, cos, sin) chain yields TWO
    normals — the transcendentals, not the bits, dominate this kernel
    (measured: unpaired 0.795 ms vs paired 0.342 ms vs threefry 0.711 ms
    for 21M draws), so each half-block of (u1, u2) fills both the cos and
    sin halves of the output block. Within-block ordering of independent
    draws is statistically irrelevant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(
        seed_ref[0] + pl.program_id(0) * jnp.int32(_WEYL), seed_ref[1]
    )
    h = out_ref.shape[0] // 2
    b1 = pltpu.bitcast(pltpu.prng_random_bits((h, _LANES)), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits((h, _LANES)), jnp.uint32)
    # In-kernel unit mapping (same as _unit_open_closed, with pltpu.bitcast)
    u1 = 2.0 - pltpu.bitcast(jnp.uint32(0x3F800000) | (b1 >> jnp.uint32(9)), jnp.float32)
    u2 = 2.0 - pltpu.bitcast(jnp.uint32(0x3F800000) | (b2 >> jnp.uint32(9)), jnp.float32)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = jnp.float32(_TWO_PI) * u2
    out_ref[:h] = r * jnp.cos(theta)
    out_ref[h:] = r * jnp.sin(theta)


def _bits_kernel(seed_ref, out_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(
        seed_ref[0] + pl.program_id(0) * jnp.int32(_WEYL), seed_ref[1]
    )
    out_ref[:] = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.uint32)


def _grid_call(kernel, key, total, out_dtype):
    """Run a seeded elementwise-generator kernel over a padded row grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = -(-total // _LANES)
    grid = -(-rows // _BLOCK_ROWS)
    rows_p = grid * _BLOCK_ROWS
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((rows_p, _LANES), out_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0)),
    )(_seed_words(key))
    return out.reshape(-1)[:total]


def hw_normal(key, shape, dtype=jnp.float32):
    """Standard-normal draws from the hardware PRNG (Box-Muller in VMEM)."""
    total = int(np.prod(shape)) if shape else 1
    out = _grid_call(_normal_kernel, key, total, jnp.float32)
    return out.reshape(shape).astype(dtype)


def hw_uniform(key, shape, dtype=jnp.float32):
    """(0, 1] uniform draws from the hardware PRNG."""
    total = int(np.prod(shape)) if shape else 1
    bits = _grid_call(_bits_kernel, key, total, jnp.uint32)
    return _unit_open_closed(bits).reshape(shape).astype(dtype)


def hw_gamma(key, alpha, dtype=jnp.float32):
    """gamma(alpha, 1) draws via Marsaglia-Tsang on hardware-PRNG entropy.

    alpha: array of per-element shape parameters (any shape). Supports
    alpha < 1 through the boost gamma(a) = gamma(a+1) * U^(1/a). Fixed
    _MT_ROUNDS unrolled rejection rounds with a where-chain taking the
    first accepted candidate; the (~4e-9/element) never-accepted residual
    falls back to the mode-adjacent value d = a_eff - 1/3.
    """
    alpha = jnp.asarray(alpha, dtype)
    shape = alpha.shape
    boost = alpha < 1.0
    a_eff = jnp.where(boost, alpha + 1.0, alpha)
    d = a_eff - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    res = d  # fallback for the never-accepted residual
    accepted = jnp.zeros(shape, dtype=bool)
    for r in range(_MT_ROUNDS):
        z = hw_normal(jax.random.fold_in(key, 2 * r), shape, dtype)
        u = hw_uniform(jax.random.fold_in(key, 2 * r + 1), shape, dtype)
        one_cz = 1.0 + c * z
        v = one_cz * one_cz * one_cz
        ok = (v > 0.0) & (
            jnp.log(u) < 0.5 * z * z + d - d * v + d * jnp.log(jnp.maximum(v, 1e-30))
        )
        take = ok & ~accepted
        res = jnp.where(take, d * v, res)
        accepted = accepted | ok

    u_boost = hw_uniform(jax.random.fold_in(key, 2 * _MT_ROUNDS), shape, dtype)
    res = res * jnp.where(boost, u_boost ** (1.0 / jnp.maximum(alpha, 1e-12)), 1.0)
    return res
