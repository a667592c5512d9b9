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


def _unit_pl(bits):
    """In-kernel (0, 1] unit mapping (pltpu.bitcast variant)."""
    from jax.experimental.pallas import tpu as pltpu

    return 2.0 - pltpu.bitcast(
        jnp.uint32(0x3F800000) | (bits >> jnp.uint32(9)), jnp.float32
    )


def _mutation_draws_kernel(seed_ref, alpha_ref, z_ref, g_ref, u_ref):
    """ALL of one MCMC step's randomness in ONE kernel launch.

    At flagship walker counts the step is launch-latency bound: XLA's
    threefry gamma alone measures ~31 us of the ~75 us step, and the
    separate hw_normal/hw_gamma path costs ~13 launches. This kernel
    draws the (R*N*d) proposal normals (paired Box-Muller), the (N,)
    Marsaglia-Tsang gamma mixture scales (alpha >= 1 via the boost), and
    the (N,) acceptance uniforms from one PRNG seeding, entirely in VMEM.
    Single-instance (no grid): callers gate it to sizes that fit VMEM.
    """
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0], seed_ref[1])

    # --- proposal normals: paired Box-Muller over half-blocks ----------
    h = z_ref.shape[0] // 2
    b1 = pltpu.bitcast(pltpu.prng_random_bits((h, _LANES)), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits((h, _LANES)), jnp.uint32)
    u1 = _unit_pl(b1)
    u2 = _unit_pl(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = jnp.float32(_TWO_PI) * u2
    z_ref[:h] = r * jnp.cos(theta)
    z_ref[h:] = r * jnp.sin(theta)

    # --- gamma(alpha) via Marsaglia-Tsang, unrolled rounds -------------
    ashape = alpha_ref.shape
    alpha = alpha_ref[:]
    boost = alpha < 1.0
    a_eff = jnp.where(boost, alpha + 1.0, alpha)
    d = a_eff - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    res = d
    accepted = jnp.zeros(ashape, dtype=jnp.bool_)
    for _ in range(_MT_ROUNDS):
        gb1 = pltpu.bitcast(pltpu.prng_random_bits(ashape), jnp.uint32)
        gb2 = pltpu.bitcast(pltpu.prng_random_bits(ashape), jnp.uint32)
        gbu = pltpu.bitcast(pltpu.prng_random_bits(ashape), jnp.uint32)
        gu1 = _unit_pl(gb1)
        gu2 = _unit_pl(gb2)
        zn = jnp.sqrt(-2.0 * jnp.log(gu1)) * jnp.cos(jnp.float32(_TWO_PI) * gu2)
        uacc = _unit_pl(gbu)
        one_cz = 1.0 + c * zn
        v = one_cz * one_cz * one_cz
        ok = (v > 0.0) & (
            jnp.log(uacc)
            < 0.5 * zn * zn + d - d * v + d * jnp.log(jnp.maximum(v, 1e-30))
        )
        take = ok & ~accepted
        res = jnp.where(take, d * v, res)
        accepted = accepted | ok
    ub = _unit_pl(pltpu.bitcast(pltpu.prng_random_bits(ashape), jnp.uint32))
    g_ref[:] = res * jnp.where(
        boost, ub ** (1.0 / jnp.maximum(alpha, 1e-12)), 1.0
    )

    # --- acceptance uniforms ------------------------------------------
    u_ref[:] = _unit_pl(
        pltpu.bitcast(pltpu.prng_random_bits(u_ref.shape), jnp.uint32)
    )


# VMEM budget for the single-instance fused kernel: z out + 2x bits
# temporaries at 4 B each, plus the small gamma/uniform arrays — measured:
# 1.3M z-elems needs 19.9 MB scoped VMEM (> the 16 MB limit), 2^19 fits
# with ~2x headroom. Above this the separate gridded kernels take over.
_FUSED_DRAWS_MAX_ELEMS = 1 << 19


def fused_draws_supported(n_z_elems: int, n_walkers: int, dtype) -> bool:
    """Gate for the single-launch mutation-draw kernel."""
    if not hw_prng_supported(dtype):
        return False
    if n_z_elems % (2 * _LANES) != 0 or n_walkers % _LANES != 0:
        return False
    return n_z_elems <= _FUSED_DRAWS_MAX_ELEMS


def hw_mutation_draws(key, alpha, z_shape, dtype=jnp.float32):
    """(z, gamma, accept_uniform) for one MCMC step in ONE kernel launch.

    z_shape: (R, N, d) proposal-normal shape; alpha: (N,) gamma shapes.
    Caller gates via `fused_draws_supported(R*N*d, N, dtype)`.
    """
    import numpy as _np

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    total = int(_np.prod(z_shape))
    n = alpha.shape[0]
    z, g, u = pl.pallas_call(
        _mutation_draws_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((total // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(_seed_words(key), alpha.reshape(n // _LANES, _LANES).astype(jnp.float32))
    return (
        z.reshape(z_shape).astype(dtype),
        g.reshape(n).astype(dtype),
        u.reshape(n).astype(dtype),
    )


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
