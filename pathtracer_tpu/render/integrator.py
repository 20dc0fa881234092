"""Progressive render driver.

The reference's host orchestration loop (``runCuda`` ``src/main.cpp:103-176``
+ ``cudaRaytraceCore`` ``src/raytraceKernel.cu:164-227``) re-designed for
XLA: instead of re-uploading the scene and image every iteration
(raytraceKernel.cu:174-198/215 — the reference's biggest inefficiency,
SURVEY.md §3.2), the scene and the HDR sum accumulator stay device-resident,
the accumulator buffer is donated across calls, and ``iters_per_launch``
progressive iterations are fused into one compiled ``lax.fori_loop`` so the
host touches the device once per chunk, not once per sample.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops import rng
from pathtracer_tpu.ops.camera import generate_camera_rays
from pathtracer_tpu.ops.tonemap import tonemap
from pathtracer_tpu.scene.structs import Scene


def render_sample(
    scene: Scene,
    pixel_index,
    iteration,
    base_key,
    cfg: RenderConfig,
    n_global_pixels: int | None = None,
):
    """One progressive iteration: one jittered sample per listed pixel.
    Returns ``(radiance [N, 3], rays_traced)`` (megakernel engine).

    All randomness is keyed by the global sample index ``iteration *
    n_global_pixels + pixel`` (the RNG/sharding contract shared with the
    wavefront engine)."""
    n_global = n_global_pixels if n_global_pixels is not None else pixel_index.shape[0]
    sample_idx = iteration * n_global + pixel_index
    from pathtracer_tpu.render.common import camera_uniforms

    u4 = camera_uniforms(base_key, sample_idx, cfg.fast_rng)
    rays = generate_camera_rays(
        scene.camera, pixel_index, None, jitter=cfg.jitter, per_ray_uniforms=u4
    )
    from pathtracer_tpu.render.megakernel import trace_paths

    return trace_paths(scene, rays, sample_idx, base_key, cfg)


@functools.lru_cache(maxsize=None)
def _chunk_executable(cfg: RenderConfig, n_iters: int):
    """One jit object per (cfg, n_iters).

    A single jit with static args would work too, but separate jit objects
    keep each config's executable + donation bookkeeping fully independent
    (interleaving donated calls across configs of one jit object tripped an
    XLA buffer-count error on the CPU backend)."""

    @functools.partial(jax.jit, donate_argnames=("accum",))
    def chunk(scene: Scene, accum, start_iteration, base_key):
        n_pixels = accum.shape[0]
        if cfg.wavefront:
            from pathtracer_tpu.render.wavefront import (
                render_samples_pinned,
                render_samples_wavefront,
            )

            if cfg.wavefront_pinned and n_pixels <= cfg.wavefront_pinned_max_pixels:
                return render_samples_pinned(
                    scene, accum, start_iteration, n_iters, base_key, cfg
                )
            start_sample = start_iteration * n_pixels
            return render_samples_wavefront(
                scene, accum, start_sample, n_iters * n_pixels, base_key, cfg
            )  # -> (accum, rays_traced)

        # lax.iota, not jnp.arange: arange materializes a trace-time numpy
        # constant, which this jax version holds only weakly in the compiled
        # executable (second call then fails with a buffer-count mismatch)
        pixel_index = jax.lax.iota(jnp.int32, n_pixels)

        if cfg.debug:
            def body(i, carry):
                acc, nrays, hist = carry
                it = start_iteration + i
                radiance, n, h = render_sample(scene, pixel_index, it, base_key, cfg)
                return acc + radiance, nrays + n, hist + h

            return jax.lax.fori_loop(
                0, n_iters, body,
                (accum, jnp.float32(0.0), jnp.zeros((cfg.max_depth,), jnp.float32)),
            )

        def body(i, carry):
            acc, nrays = carry
            it = start_iteration + i
            radiance, n = render_sample(scene, pixel_index, it, base_key, cfg)
            return acc + radiance, nrays + n

        return jax.lax.fori_loop(0, n_iters, body, (accum, jnp.float32(0.0)))

    return chunk


def render_chunk(
    scene: Scene,
    accum: jax.Array,
    start_iteration: jax.Array,
    base_key: jax.Array,
    cfg: RenderConfig,
    n_iters: int,
):
    """Accumulate ``n_iters`` progressive iterations into ``accum`` ([N,3]
    radiance **sum**, the analog of ``renderCam->image`` main.cpp:134-141).
    ``accum`` is donated: the buffer stays device-resident across chunks.
    Returns ``(accum, rays_traced)``."""
    return _chunk_executable(cfg, n_iters)(scene, accum, start_iteration, base_key)


def render(
    scene: Scene,
    spp: int,
    cfg: Optional[RenderConfig] = None,
    base_key: Optional[jax.Array] = None,
    accum: Optional[jax.Array] = None,
    start_iteration: int = 0,
    progress_fn=None,
):
    """Render ``spp`` progressive samples/pixel; returns ``(image, accum,
    stats)``: the tone-mapped image ``[H, W, 3]`` in [0,1], the raw sum
    accumulator ``[N, 3]``, and a stats dict (``rays_traced``).

    ``accum``/``start_iteration`` allow resuming (checkpoint support,
    SURVEY.md §5)."""
    cfg = cfg or RenderConfig()
    # trim unused optional physics blocks AND enable scene-required ones
    # (e.g. "microfacet" for BRDF cooktorrance materials) from the
    # concrete material table; explicit features pins are honored
    from pathtracer_tpu.render.diff import resolve_features

    cfg = resolve_features(cfg, scene.materials)
    if base_key is None:
        base_key = jax.random.PRNGKey(cfg.seed)
    w, h = scene.camera.width, scene.camera.height
    n_pixels = w * h
    if accum is None:
        accum = jnp.zeros((n_pixels, 3), jnp.float32)

    # debug mode (SURVEY §2 #15): jax_debug_nans for the duration of the
    # render + a host-side finite check after every chunk — the analog of
    # the reference's checkCUDAError-after-launch (raytraceKernel.cu:226)
    debug_nans_prev = None
    if cfg.debug:
        debug_nans_prev = jax.config.jax_debug_nans
        jax.config.update("jax_debug_nans", True)

    import numpy as np

    done = 0
    counts = []  # device scalars; summed once at the end (keeps dispatch async)
    hists = []
    try:
        while done < spp:
            chunk = min(cfg.iters_per_launch, spp - done)
            out = render_chunk(
                scene,
                accum,
                jnp.asarray(start_iteration + done, jnp.int32),
                base_key,
                cfg,
                chunk,
            )
            accum, nrays = out[0], out[1]
            if len(out) > 2:
                hists.append(out[2])
            if cfg.debug and not np.isfinite(np.asarray(accum)).all():
                raise RuntimeError(
                    f"debug: non-finite accumulator after spp window "
                    f"[{start_iteration + done}, {start_iteration + done + chunk})"
                )
            counts.append(nrays)
            done += chunk
            if progress_fn is not None:
                progress_fn(done, accum)
    finally:
        if debug_nans_prev is not None:
            jax.config.update("jax_debug_nans", debug_nans_prev)

    total = start_iteration + spp
    img = tonemap(accum.reshape(h, w, 3), total)
    stats = {"rays_traced": float(sum(float(c) for c in counts)), "spp": spp}
    if hists:
        stats["alive_per_bounce"] = [
            float(x) for x in np.sum([np.asarray(h) for h in hists], axis=0)
        ]
    return img, accum, stats
