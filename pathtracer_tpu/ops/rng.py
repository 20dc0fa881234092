"""Counter-based RNG keying.

The reference seeds a per-thread engine from ``hash(index * time)``
(``src/intersections.h:26-34``, ``src/raytraceKernel.cu:30-37``) — a
hand-rolled approximation of a counter-based PRNG.  JAX's threefry *is*
a counter-based PRNG, so the TPU-native design is simply structured
``fold_in`` keying: one base key per render, folded with (iteration,
bounce, purpose).  Per-ray randomness comes from array-shaped draws, which
threefry computes in parallel over the counter lattice — stateless,
reproducible, and order-independent, which also makes checkpoint/resume
exact (resume at iteration k regenerates the same sample sequence).
"""

from __future__ import annotations

import jax

# stream ids (purpose tags folded into the key)
CAMERA = 0
BSDF = 1
RUSSIAN_ROULETTE = 2
LENS = 3


def iteration_key(base_key: jax.Array, iteration: jax.Array) -> jax.Array:
    return jax.random.fold_in(base_key, iteration)


def stream_key(base_key, iteration, bounce=0, stream=0) -> jax.Array:
    k = jax.random.fold_in(base_key, iteration)
    k = jax.random.fold_in(k, bounce)
    return jax.random.fold_in(k, stream)


# ---------------------------------------------------------------------------
# Fast counter-hash RNG (cfg.fast_rng)
# ---------------------------------------------------------------------------
# Threefry is gold-standard but costs ~8 block ciphers per lane per bounce
# in the per-sample keying scheme.  Rendering needs far less: the reference
# seeds thrust from a Wang-style integer hash (intersections.h:26-34).
# This is the same idea done properly: a murmur3/splitmix-quality avalanche
# finalizer over the (seed, sample, depth, slot) counter lattice — still a
# pure function of those counters, so every determinism/sharding/resume
# contract is preserved.

import jax.numpy as jnp


def _u32mul(x: jax.Array, c: int) -> jax.Array:
    """uint32 multiply-mod-2^32 via int32.

    The TPU VPU has a native 32-bit *signed* multiplier; XLA emulates the
    unsigned one ~11x slower (measured 0.47ms vs 0.043ms per 256Ki-lane
    op).  Two's-complement multiplication is bitwise identical mod 2^32,
    so bitcast -> imul -> bitcast is exact."""
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    ci = jnp.int32(c - (1 << 32) if c >= (1 << 31) else c)
    return jax.lax.bitcast_convert_type(xi * ci, jnp.uint32)


def _avalanche(x: jax.Array) -> jax.Array:
    """murmur3 fmix32 finalizer (full avalanche) on uint32."""
    x = x ^ (x >> 16)
    x = _u32mul(x, 0x7FEB352D)
    x = x ^ (x >> 15)
    x = _u32mul(x, 0x846CA68B)
    x = x ^ (x >> 16)
    return x


def key_to_seed(base_key: jax.Array) -> jax.Array:
    """Collapse a threefry key to a uint32 seed for the fast hash."""
    k = base_key.astype(jnp.uint32).reshape(-1)
    return _avalanche(_u32mul(k[0], 0x9E3779B9) ^ k[-1])


CAMERA_STREAM = 0x10000  # depth slot reserved for camera/lens draws


def hash_uniforms(seed_u32, sample_idx, depth, n: int) -> jax.Array:
    """[N, n] uniforms in [0, 1): a pure function of
    (seed, sample_idx, depth, slot) — the fast-path replacement for the
    fold_in/threefry chain in bounce_uniforms."""
    s = sample_idx.astype(jnp.uint32)
    d = jnp.broadcast_to(jnp.asarray(depth), sample_idx.shape).astype(jnp.uint32)
    base = _avalanche(
        seed_u32
        ^ _u32mul(s, 0x85EBCA6B)
        ^ _u32mul(d + jnp.uint32(1), 0xC2B2AE35)
    )
    slots = _u32mul(jax.lax.iota(jnp.uint32, n)[None, :], 0x27D4EB2F)
    bits = _avalanche(base[:, None] ^ slots)
    # 24-bit mantissa -> exact float32 uniforms in [0, 1)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
