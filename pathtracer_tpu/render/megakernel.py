"""Masked megakernel path integrator.

The reference's (to-be-completed) ``raytraceRay`` CUDA kernel
(``src/raytraceKernel.cu:123-159``) as a single jitted dataflow graph: a
``lax.scan`` over a fixed ``max_depth`` bounce axis, with an ``alive``
mask instead of thread divergence/stream compaction.  Dead lanes cost VPU
cycles but no control flow — on TPU this is often competitive with
compaction because it is pure fused elementwise work with zero
gather/scatter traffic.  (The wavefront+compaction engine lives in
``wavefront.py``; this one is the *differentiable* path: ``scan`` is
reverse-mode friendly, ``while_loop`` is not — SURVEY.md §7.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops.bsdf import gather_materials, sample_bsdf
from pathtracer_tpu.ops.intersect import intersect_scene
from pathtracer_tpu.scene.structs import Rays, Scene


def trace_paths(
    scene: Scene, rays: Rays, key: jax.Array, cfg: RenderConfig
):
    """Trace a wavefront of primary rays to completion.

    Returns ``(radiance [N, 3], rays_traced [] float32)`` — one sample of
    the path-traced estimator per input ray (the "full global illumination
    + emittance" requirement, reference README.md:47-48) plus the number
    of ray-intersection queries actually issued (for Mrays/s metrics).
    """
    n = rays.count
    radiance0 = jnp.zeros((n, 3), jnp.float32)
    throughput0 = jnp.ones((n, 3), jnp.float32)
    alive0 = jnp.ones((n,), bool)
    bounce_keys = jax.random.split(key, cfg.max_depth)

    def bounce(carry, inp):
        depth, bkey = inp
        rays, throughput, alive, radiance, nrays = carry
        nrays = nrays + jnp.sum(alive.astype(jnp.float32))
        hit = intersect_scene(rays, scene.geoms)
        mat = gather_materials(scene.materials, hit.material_id)
        emissive = mat.emittance > 0.0

        # emittance accumulation on light hit (terminates the path)
        contrib = throughput * mat.color * mat.emittance[:, None]
        take = alive & hit.hit & emissive
        radiance = radiance + jnp.where(take[:, None], contrib, 0.0)

        new_alive = alive & hit.hit & (~emissive)

        ku, krr = jax.random.split(bkey)
        u = jax.random.uniform(ku, (n, 3))
        scatter = sample_bsdf(mat, hit.position, hit.normal, rays.direction, u)
        throughput = jnp.where(
            new_alive[:, None], throughput * scatter.throughput_mult, throughput
        )

        if cfg.russian_roulette:
            p = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
            p = jax.lax.stop_gradient(p)
            rr_active = new_alive & (depth >= cfg.rr_start)
            survive = jax.random.uniform(krr, (n,)) < p
            throughput = jnp.where(
                rr_active[:, None], throughput / p[:, None], throughput
            )
            new_alive = jnp.where(rr_active, new_alive & survive, new_alive)

        rays = Rays(
            origin=jnp.where(new_alive[:, None], scatter.origin, rays.origin),
            direction=jnp.where(
                new_alive[:, None], scatter.direction, rays.direction
            ),
        )
        return (rays, throughput, new_alive, radiance, nrays), None

    (_, _, _, radiance, nrays), _ = jax.lax.scan(
        bounce,
        (rays, throughput0, alive0, radiance0, jnp.float32(0.0)),
        (jax.lax.iota(jnp.int32, cfg.max_depth), bounce_keys),
    )
    return radiance, nrays
