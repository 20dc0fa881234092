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
