"""Render configuration.

The reference scatters its render settings across the scene DSL camera
block (RES / FOVY / ITERATIONS / FILE, ``src/scene.cpp:141-188``) and
hardcoded constants (``traceDepth = 1`` at ``raytraceKernel.cu:166``,
``tileSize = 8`` at ``:169``).  Here they live in one dataclass that is
hashable (usable as a static jit argument) and overridable from the CLI.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    max_depth: int = 8  # bounces per path (reference basecode: 1)
    jitter: bool = True  # supersampled AA (README.md:49)
    nee: bool = True  # next-event estimation (direct light sampling);
    # False = pure BSDF+emittance estimator (reference-assignment parity)
    vol_nee: bool = True  # direct-light sampling at in-medium scatter
    # events (phase-weighted, straight-line transmittance through
    # refractive boundaries — render/common.py).  False restores the
    # chance-hit-only volumetric estimator: unbiased w.r.t. refraction
    # at the boundary but far higher variance in dense media.
    russian_roulette: bool = False  # RR path termination after rr_start bounces
    rr_start: int = 3
    iters_per_launch: int = 16  # progressive iterations fused into one jit call
    wavefront: bool = False  # wavefront+regeneration engine vs masked megakernel
    wavefront_pinned: bool = True  # slot==pixel wavefront (no scatter; lane
    # count = local pixel count).  False = free-slot queue engine with
    # wavefront_capacity lanes and cumsum-rank refill (lower memory).
    # MEMORY: pinned path state is ~88 B/lane and scales with the LOCAL
    # pixel count (a 4K frame/device is ~0.7 GB of HBM state); the queue
    # engine's state is fixed at wavefront_capacity lanes.  Above
    # wavefront_pinned_max_pixels the integrator auto-falls back to the
    # queue engine (ADVICE r1).
    wavefront_pinned_max_pixels: int = 1 << 21  # pinned-engine cutoff
    # (2M pixels ~= 185 MB of path state per device)
    wavefront_capacity: int = 1 << 18  # path slots per device (queue engine)
    accum_dtype: str = "float32"  # HDR sum accumulator dtype
    compute_dtype: str = "float32"
    seed: int = 0
    fast_rng: bool = True  # murmur-counter RNG vs threefry fold_in chain
    pallas: bool | None = None  # fused Pallas intersection kernels.
    # None = auto: on for TPU, off elsewhere.  Forward engines only — the
    # differentiable path (render/diff.py) always uses the XLA sweep.
    fused: bool | None = None  # fully-fused bounce megakernel
    # (ops/bounce_pallas.py).  None = auto (r4): on whenever the pallas
    # path is active and fast_rng is on — meshes ride the mesh-merge
    # variant, image textures the deferred-texel wrapper, CT/Ward/HG run
    # in-kernel.  The only auto declines are slow RNG and the
    # mesh+volumetric-NEE combination; both warn once.
    grad_fused: bool | None = None  # fused Pallas backward for the bounce
    # (ops/bounce_grad.py): forward = the fused megakernel, backward = a
    # Pallas kernel computing jax.vjp of the same physics in VMEM.
    # None = auto (on for TPU when the scene qualifies: analytic-only, no
    # image textures, fast_rng; Cook-Torrance/Ward differentiate
    # IN-KERNEL via the shared physics' feature gates, HG keeps the lean
    # backward); True forces it (incl. interpret mode on CPU — tests);
    # False pins the lean XLA backward.  See
    # render/common.fused_diff_eligible.
    grad_full_trace: bool | None = None  # full-depth differentiable trace
    # (ops/trace_grad.py): ONE forward kernel streaming per-bounce
    # residuals + ONE reverse-loop backward kernel per progressive
    # iteration, replacing the per-bounce fused-diff scan (max_depth
    # launches each way).  None = auto (on whenever the fused-diff
    # engine qualifies — render/common.fused_diff_eligible); False pins
    # the per-bounce fused-diff engine.
    grad_lean: bool = False  # gradient-lean intersection: winner search
    # under stop_gradient (Pallas kernel when pallas is active), O(N)
    # differentiable recompute of the winning primitive only, and a
    # detached occlusion sweep.  Set by render/diff.py for the backward
    # path; numerically equal to the full sweep a.e.
    debug: bool = False  # debug/observability mode (SURVEY §2 #15, §5 —
    # the checkCUDAError analog, raytraceKernel.cu:20-26): enables
    # jax_debug_nans for the duration of render(), host-checks the
    # accumulator for non-finite values after every chunk (RuntimeError
    # names the failing spp window), and collects a per-bounce alive-lane
    # histogram into stats["alive_per_bounce"] (megakernel engine).
    features: tuple = ("texture", "bump", "volumetric", "glossy")
    # which optional physics blocks shade_bounce materializes.  Disabling
    # a feature NO material in the scene uses is a pure no-op on the image
    # but removes its ops (and their transposes) from the compiled graph —
    # render/diff.py trims this automatically via features_for_materials().
    # NOTE: "microfacet" (Cook-Torrance GGX) and "ward" (Ward anisotropic)
    # are intentionally NOT defaults: auto_features adds them when a
    # material sets BRDF cooktorrance / BRDF ward.
    auto_features: bool = True  # recompute `features` from the concrete
    # material table at the render entry points (integrator.render,
    # parallel.render_sharded, render/diff.py) — both trims unused blocks
    # and enables scene-required ones (e.g. "microfacet").  Set False to
    # pin `features` manually.
