"""HDR accumulator -> displayable image.

Replaces the reference's two output paths with one vectorized op:

* ``sendImageToPBO`` (``src/raytraceKernel.cu:88-119``): x255 + clamp for
  the live display (no gamma, no divide in basecode).
* ``image::applyGamma`` + save (``src/image.cpp:40-43``, configured at
  ``src/main.cpp:143-147``): ``out = (pixel / iterations) ** (1/2.2)``,
  i.e. progressive-average normalize then gamma.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GAMMA = 1.0 / 2.2  # main.cpp:145


def tonemap(
    accum: jax.Array, iterations, gamma: float = GAMMA, apply_gamma: bool = True
) -> jax.Array:
    """``accum``: [..., 3] running radiance **sum**; returns float [0,1]."""
    img = accum / jnp.maximum(jnp.asarray(iterations, accum.dtype), 1.0)
    if apply_gamma:
        img = jnp.clip(img, 0.0) ** gamma
    return jnp.clip(img, 0.0, 1.0)


def to_uint8(img01: jax.Array) -> jax.Array:
    """[0,1] float -> uint8 with the reference's truncation semantics
    (``(int)(v*255)`` clamped, raytraceKernel.cu:100-110 / image.cpp:52-59)."""
    return jnp.clip(img01 * 255.0, 0.0, 255.0).astype(jnp.uint8)
