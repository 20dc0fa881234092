"""Masked megakernel path integrator.

The reference's (to-be-completed) ``raytraceRay`` CUDA kernel
(``src/raytraceKernel.cu:123-159``) as a single jitted dataflow graph: a
``lax.scan`` over a fixed ``max_depth`` bounce axis, with an ``alive``
mask instead of thread divergence/stream compaction.  Dead lanes cost VPU
cycles but no control flow.  (The wavefront+regeneration engine lives in
``wavefront.py``; this one is the *differentiable* path: ``scan`` is
reverse-mode friendly, ``while_loop`` is not — SURVEY.md §7.)

The physics of a bounce lives in ``render/common.py:shade_bounce`` and is
shared with the wavefront engine; the RNG contract there makes both
engines produce identical estimates for the same sample set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.common import bounce_uniforms, shade_bounce
from pathtracer_tpu.scene.structs import Rays, Scene

__all__ = ["trace_paths", "bounce_uniforms"]


def trace_paths(
    scene: Scene,
    rays: Rays,
    sample_idx: jax.Array,
    base_key: jax.Array,
    cfg: RenderConfig,
):
    """Trace a wavefront of primary rays to completion.

    Returns ``(radiance [N, 3], rays_traced [] float32)`` — one sample of
    the path-traced estimator per input ray (full global illumination +
    emittance accumulation, reference README.md:47-48) plus the number of
    primary+bounce rays issued (shadow rays counted separately by callers
    via the 2x factor when cfg.nee)."""
    n = rays.count

    if not cfg.grad_lean and not cfg.debug:
        # full-depth fused trace (ops/trace_pallas.py): the entire bounce
        # loop in one pallas_call — bit-identical to the scan below
        # (same physics fn, RNG, masking; pinned by test_trace_pallas)
        from pathtracer_tpu.ops.trace_pallas import (
            fused_trace_eligible,
            trace_fused,
        )

        use_pallas = (
            cfg.pallas
            if cfg.pallas is not None
            else jax.default_backend() == "tpu"
        )
        want = (
            cfg.fused
            if cfg.fused is not None
            else (use_pallas and jax.default_backend() == "tpu")
        )
        if want and use_pallas and fused_trace_eligible(scene, cfg):
            return trace_fused(scene, rays, sample_idx, base_key, cfg)

    from pathtracer_tpu.render.common import fused_diff_eligible

    if cfg.grad_lean and fused_diff_eligible(scene, cfg):
        if cfg.grad_full_trace is not False and not cfg.debug:
            # Full-depth differentiable trace (ops/trace_grad.py): the
            # whole bounce loop forward AND backward in one kernel each —
            # replaces the per-bounce scan below (max_depth launches per
            # direction) on eligible scenes.
            from pathtracer_tpu.ops.trace_grad import trace_fused_diff

            return trace_fused_diff(scene, rays, sample_idx, base_key, cfg)
        # Fused-diff path: shade_bounce routes to the custom_vjp Pallas
        # bounce (ops/bounce_grad.py) whose residuals are exactly the
        # scan carries — no remat wrapper needed (wrapping would force a
        # redundant forward re-run per bounce; the vjp kernel already
        # recomputes the bounce internally, in VMEM).
        def shade(scene, rays, throughput, sample_idx, depth, prev_spec, base_key, medium):
            return shade_bounce(
                scene, rays, throughput, sample_idx, depth, prev_spec,
                base_key, cfg, medium_sigma=medium,
            )
    elif cfg.grad_lean:
        # Per-bounce rematerialization (the round-3 fwd+bwd speed work).
        # Without it, jax.vjp of the depth scan stacks EVERY transpose
        # residual per bounce into [depth, N]-shaped HBM arrays and
        # streams them back in the backward scan — measured ~0.58 s of
        # the 0.77 s step at 800x800 d8, dominated by residual copies
        # (some in 128x-padded [N,1]{T(1,128)} layouts).  With it, only
        # the scan carries plus the named winner/occlusion outputs are
        # saved; the backward re-derives the cheap elementwise shading
        # from the carry, fused in-register.  The detached Pallas winner
        # search and occlusion sweeps are tagged 'lean_winner' so they
        # are NOT re-run (their outputs are the saved residuals).
        from jax.ad_checkpoint import checkpoint as _remat
        from jax.ad_checkpoint import checkpoint_policies as _policies

        def _shade(scene, rays, throughput, sample_idx, depth, prev_spec, base_key, medium):
            return shade_bounce(
                scene, rays, throughput, sample_idx, depth, prev_spec,
                base_key, cfg, medium_sigma=medium,
            )

        _shade = _remat(
            _shade, policy=_policies.save_only_these_names("lean_winner")
        )

        def shade(scene, rays, throughput, sample_idx, depth, prev_spec, base_key, medium):
            return _shade(
                scene, rays, throughput, sample_idx, depth, prev_spec, base_key, medium
            )
    else:
        def shade(scene, rays, throughput, sample_idx, depth, prev_spec, base_key, medium):
            return shade_bounce(
                scene, rays, throughput, sample_idx, depth, prev_spec,
                base_key, cfg, medium_sigma=medium,
            )

    def bounce(carry, depth):
        rays, throughput, alive, prev_spec, medium, radiance, nrays = carry
        n_alive = jnp.sum(alive.astype(jnp.float32))
        nrays = nrays + n_alive * (2.0 if cfg.nee else 1.0)  # +shadow ray
        res = shade(
            scene, rays, throughput, sample_idx, depth, prev_spec, base_key, medium
        )
        radiance = radiance + jnp.where(alive[:, None], res.contrib, 0.0)
        new_alive = alive & (~res.terminate)
        throughput = jnp.where(
            new_alive[:, None], throughput * res.throughput_mult, throughput
        )
        if cfg.russian_roulette:
            p = jax.lax.stop_gradient(
                jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
            )
            rr_active = new_alive & (depth >= cfg.rr_start)
            survive = res.rr_uniform < p
            throughput = jnp.where(
                rr_active[:, None], throughput / p[:, None], throughput
            )
            new_alive = jnp.where(rr_active, new_alive & survive, new_alive)

        rays = Rays(
            origin=jnp.where(new_alive[:, None], res.next_origin, rays.origin),
            direction=jnp.where(
                new_alive[:, None], res.next_direction, rays.direction
            ),
        )
        carry = (
            rays, throughput, new_alive, res.was_specular, res.next_medium,
            radiance, nrays,
        )
        # ys: per-bounce alive-lane count (debug observability, SURVEY §5)
        return carry, (n_alive if cfg.debug else None)

    init = (
        rays,
        jnp.ones((n, 3), jnp.float32),
        jnp.ones((n,), bool),
        jnp.zeros((n,), jnp.float32),  # emit-state code (BounceResult)
        # medium (sigma_a rgb, sigma_s[, HG g]) — g column only when the
        # "hg" feature is on (it rides every carry; see common.py)
        jnp.zeros((n, 5 if "hg" in cfg.features else 4), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.float32(0.0),
    )
    (_, _, _, _, _, radiance, nrays), alive_hist = jax.lax.scan(
        bounce, init, jax.lax.iota(jnp.int32, cfg.max_depth)
    )
    if cfg.debug:
        return radiance, nrays, alive_hist
    return radiance, nrays
