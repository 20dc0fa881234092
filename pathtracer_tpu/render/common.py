"""The shared per-bounce shading step used by both engines.

One bounce = intersect → emittance accounting → next-event estimation
(direct light, SURVEY.md §2 component 7) → BSDF sampling for the
continuation ray.  The megakernel (lax.scan, differentiable) and the
wavefront engine (while_loop + regeneration, forward-perf) wrap this with
their own lane bookkeeping; the physics lives here exactly once.

Estimator (cfg.nee=True): classic NEE split —

* diffuse hits sample one point on an area light (area-weighted) and add
  ``throughput * albedo/pi * Le * cos_x cos_y / r^2 / pdf_A * V(x,y)``;
  their *BSDF-found* light hits are then NOT counted (no double count).
* specular lanes (mirror / dielectric) can't do NEE (their BSDF is a
  delta), so their light hits ARE counted, as are primary-ray hits.

cfg.nee=False falls back to the pure BSDF+emittance estimator — the
completed-assignment semantics of the reference (README.md:47-50).

RNG: ``bounce_uniforms`` — 11 uniforms per (sample, depth): 3 BSDF lobe/
direction, 1 russian roulette, 4 light sampling, 3 volumetric scattering
(free-path distance + phase direction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops.bsdf import RAY_BIAS, gather_materials, sample_bsdf
from pathtracer_tpu.ops.intersect import intersect_scene
from pathtracer_tpu.ops.lights import sample_lights
from pathtracer_tpu.scene.structs import Rays, Scene, pytree_dataclass


def bounce_uniforms(base_key, sample_idx, depth, fast_rng: bool = True):
    """[N, 11] uniforms, a pure function of (base_key, sample, depth) —
    the RNG contract that makes engines and shardings agree exactly."""
    if fast_rng:
        from pathtracer_tpu.ops.rng import hash_uniforms, key_to_seed

        return hash_uniforms(key_to_seed(base_key), sample_idx, depth, 11)
    return jax.vmap(
        lambda s, d: jax.random.uniform(
            jax.random.fold_in(jax.random.fold_in(base_key, s), d + 1), (11,)
        )
    )(sample_idx, jnp.broadcast_to(depth, sample_idx.shape))


def camera_uniforms(base_key, sample_idx, fast_rng: bool = True):
    """[N, 4] camera jitter + lens uniforms per global sample."""
    if fast_rng:
        from pathtracer_tpu.ops.rng import CAMERA_STREAM, hash_uniforms, key_to_seed

        return hash_uniforms(key_to_seed(base_key), sample_idx, CAMERA_STREAM, 4)
    keys = jax.vmap(lambda s: jax.random.fold_in(base_key, s))(sample_idx)
    return jax.vmap(lambda k: jax.random.uniform(k, (4,)))(keys)


@pytree_dataclass
class BounceResult:
    contrib: jax.Array  # [N, 3] radiance contribution this bounce
    next_origin: jax.Array  # [N, 3]
    next_direction: jax.Array  # [N, 3]
    throughput_mult: jax.Array  # [N, 3] (includes Beer-Lambert attenuation)
    terminate: jax.Array  # [N] bool: path ends here (miss/light hit)
    was_specular: jax.Array  # [N] float32 emit-state code of this bounce's
    # event: 0 = diffuse (NEE covers the next light hit), 1 = specular
    # (a following BSDF light hit COUNTS — delta lobes can't do NEE),
    # 2 = post-scatter (volumetric NEE at the scatter point already
    # estimated the straight-through-boundary connection, so light hits
    # reached via the following SPECULAR chain are suppressed; the state
    # persists through that chain and resets at the next diffuse event).
    # With cfg.nee=False everything emits, so only {0, 1} occur.
    rr_uniform: jax.Array  # [N] uniform reserved for russian roulette
    next_medium: jax.Array  # [N, 4|5] (sigma_a rgb, sigma_s[, HG g]) of medium entered


def fused_diff_eligible(scene: Scene, cfg: RenderConfig) -> bool:
    """True when the differentiable path may use the fused Pallas bounce
    with the Pallas vjp backward (ops/bounce_grad.py) instead of the
    gradient-lean XLA graph.  Scope = the fused forward kernel's own
    scope: analytic geoms only, no image-texture atlas, counter-hash RNG,
    none of the split-path-only features."""
    if cfg.grad_fused is False:
        return False
    if not cfg.fast_rng:
        return False
    if scene.meshes or scene.textures is not None:
        return False
    if "hg" in cfg.features:
        # the wide (5-col) medium state is not plumbed through the
        # backward kernel's custom_vjp yet; HG scenes keep the lean bwd
        return False
    if cfg.grad_fused:  # explicit opt-in (tests run it interpreted on CPU)
        return True
    return jax.default_backend() == "tpu"


def shade_bounce(
    scene: Scene,
    rays: Rays,
    throughput: jax.Array,
    sample_idx: jax.Array,
    depth,
    prev_specular: jax.Array,
    base_key,
    cfg: RenderConfig,
    medium_sigma: jax.Array | None = None,
) -> BounceResult:
    """One physics step for a wavefront of rays (mask-free: callers gate
    with their own alive masks).

    ``medium_sigma`` [N, 4|5] is ``(sigma_a rgb, sigma_s[, HG g])`` of the medium
    each ray currently travels through (zeros = vacuum) — the realized
    version of the reference's absorption-and-scattering stubs
    (interactions.h:11-39; ABSCOEFF / SCATTER / RSCTCOEFF DSL fields).
    Volumetric scattering: an exponential free path ~ sigma_s is sampled
    per segment; if it lands before the surface, the lane undergoes an
    in-medium scatter event instead of a surface interaction — isotropic,
    or Henyey-Greenstein when the material sets PHASE g (feature "hg")."""
    use_pallas = cfg.pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    interp_all = jax.default_backend() != "tpu"
    use_fused = cfg.fused
    mesh_attrs = any(m.has_attrs for m in scene.meshes)
    if cfg.grad_lean:
        use_fused = False  # the fused kernel has no gradient path
    # volumetric NEE's refractive-aware occlusion of MESH boundaries is
    # not plumbed through the mesh-merge DEFERRAL — big-mesh scenes with
    # scattering media take the split path under NEE.  SMEM-sized meshes
    # run the refractive/opaque triangle split IN-KERNEL
    # (ops/bounce_pallas.mesh_occ_split_planes) and stay fused.
    from pathtracer_tpu.ops.bounce_pallas import mesh_inkernel_eligible

    vol_mesh = (
        bool(scene.meshes)
        and not mesh_inkernel_eligible(scene.meshes)
        and "volumetric" in cfg.features
        and cfg.nee
        and cfg.vol_nee
    )
    if cfg.grad_lean:
        pass  # handled above
    elif use_fused is None:
        # r4: every scene class runs fused per-bounce — CT/Ward/HG lobes
        # in-kernel, authored mesh attrs on the merge planes, image
        # textures via the deferred-texel wrapper.  Remaining declines:
        # the RNG choice (the kernel hardwires the counter-hash) and the
        # mesh+volumetric+NEE combination.
        use_fused = use_pallas and cfg.fast_rng and not vol_mesh
        if use_pallas and not use_fused:
            import warnings

            reasons = []
            if not cfg.fast_rng:
                reasons.append("fast_rng=False")
            if vol_mesh:
                reasons.append(
                    "volumetric NEE with triangle meshes (mesh-boundary "
                    "occlusion not deferred)"
                )
            warnings.warn(
                "fused bounce megakernel auto-disabled ("
                + "; ".join(reasons)
                + ") — rendering on the split per-op path",
                stacklevel=2,
            )
    elif use_fused:
        # explicit opt-in must still satisfy the kernel's preconditions:
        # the in-kernel counter-hash RNG (honoring fused=True under
        # fast_rng=False would swap the sample set, ADVICE r1) and the
        # mesh+volumetric limitation.  Fall back loudly.
        unsupported = []
        if not cfg.fast_rng:
            unsupported.append("fast_rng=False")
        if vol_mesh:
            unsupported.append("volumetric NEE with triangle meshes")
        if unsupported:
            import warnings

            warnings.warn(
                "cfg.fused=True unsupported ("
                + "; ".join(unsupported)
                + ") — falling back to the split per-op path",
                stacklevel=2,
            )
            use_fused = False
    if use_fused:
        # fully-fused bounce megakernel: the entire per-bounce physics in
        # one pallas_call (ops/bounce_pallas.py); bit-compatible RNG and
        # plane-for-plane identical formulas with the split path below
        from pathtracer_tpu.ops.bounce_pallas import bounce_fused

        if medium_sigma is None:
            medium_sigma = jnp.zeros((throughput.shape[0], 4), throughput.dtype)
        return bounce_fused(
            scene, rays.origin, rays.direction, throughput, sample_idx,
            depth, prev_specular, medium_sigma, base_key, cfg,
            interpret=interp_all,
        )
    if cfg.grad_lean and fused_diff_eligible(scene, cfg):
        # fused Pallas forward + Pallas vjp backward: the whole bounce
        # (and its transpose) runs as component planes in VMEM
        from pathtracer_tpu.ops.bounce_grad import bounce_fused_diff

        if medium_sigma is None:
            medium_sigma = jnp.zeros((throughput.shape[0], 4), throughput.dtype)
        return bounce_fused_diff(
            scene, rays.origin, rays.direction, throughput, sample_idx,
            depth, prev_specular, medium_sigma, base_key, cfg,
            interpret=interp_all,
        )
    if cfg.grad_lean:
        from pathtracer_tpu.ops.intersect import intersect_scene_lean

        hit = intersect_scene_lean(
            rays, scene.geoms, scene.meshes,
            use_pallas_winner=use_pallas, interpret=interp_all,
        )
    elif use_pallas:
        from pathtracer_tpu.ops.intersect_pallas import (
            intersect_scene_pallas,
            occlusion_scene_pallas,
        )

        interp = jax.default_backend() != "tpu"
        hit = intersect_scene_pallas(
            rays, scene.geoms, scene.meshes, interpret=interp
        )
    else:
        hit = intersect_scene(rays, scene.geoms, scene.meshes)
    mat = gather_materials(scene.materials, hit.material_id)
    emissive = mat.emittance > 0.0

    # ---- procedural solid texture (elective): checker / stripes evaluated
    # in the hit geom's object space, modulating the diffuse albedo.
    # Feature-gated: scenes with no textured material skip the whole block
    # (and, under grad, its transpose) — see RenderConfig.features.
    import dataclasses as _dc

    if "texture" in cfg.features:
        cells = jnp.floor(hit.position_obj * mat.texture_scale[:, None])
        checker = jnp.mod(cells[:, 0] + cells[:, 1] + cells[:, 2], 2.0)
        stripes = jnp.mod(cells[:, 0], 2.0)
        pattern = jnp.where(mat.texture_type > 1.5, stripes, checker)
        textured = (
            (mat.texture_type > 0.5) & (mat.texture_type < 2.5) & (pattern > 0.5)
        )
        albedo = jnp.where(textured[:, None], mat.texture_color2, mat.color)
        mat = _dc.replace(mat, color=albedo)

    # ---- image-file texture (elective, reference stb_image/README.md:57):
    # UV from the object-space hit, bilinear atlas fetch modulating the
    # albedo.  Differentiable in hit geometry AND in the texel table.
    if "texture" in cfg.features and scene.textures is not None:
        from pathtracer_tpu.ops.intersect import select_rows
        from pathtracer_tpu.ops.texture import compute_uv, sample_atlas

        gid = jax.lax.stop_gradient(hit.geom_id)
        gtype = jnp.take(scene.geoms.type, gid)
        # object-space normal for mesh box-mapping: n_obj ∝ M^T n_world
        onehot = jax.nn.one_hot(gid, scene.geoms.count, dtype=jnp.float32)
        M = select_rows(onehot, jax.lax.stop_gradient(scene.geoms.transform))
        n_obj = jnp.einsum("nij,ni->nj", M[:, :3, :3], hit.normal)
        uv = compute_uv(gtype, hit.position_obj, n_obj)
        if hit.uv is not None:
            # authored OBJ vt coordinates take precedence over the
            # procedural box/sphere mapping on the lanes that have them
            uv = jnp.where(hit.uv_valid[:, None], hit.uv, uv)
        texel = sample_atlas(
            scene.textures, mat.texture_image, uv * mat.texture_scale[:, None]
        )
        is_img = mat.texture_type > 2.5
        mat = _dc.replace(
            mat, color=jnp.where(is_img[:, None], mat.color * texel, mat.color)
        )

    # ---- procedural bump mapping (elective): tangential sinusoidal
    # perturbation of the shading normal, frequency/amplitude per material
    bump_on = mat.bump_scale > 0.0
    if "bump" in cfg.features:
        n0 = hit.normal
        ax = jnp.abs(n0)
        use_x = ax[:, 0] < 0.577
        use_y = (~use_x) & (ax[:, 1] < 0.577)
        not_n = jnp.stack(
            [
                jnp.where(use_x, 1.0, 0.0),
                jnp.where(use_y, 1.0, 0.0),
                jnp.where(use_x | use_y, 0.0, 1.0),
            ],
            axis=-1,
        )
        t1 = jnp.cross(n0, not_n)
        t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True).clip(1e-12)
        t2 = jnp.cross(n0, t1)
        ph1 = jnp.sum(hit.position_obj * jnp.asarray([12.9898, 78.233, 37.719]), -1)
        ph2 = jnp.sum(hit.position_obj * jnp.asarray([93.989, 26.651, 61.312]), -1)
        amp = jnp.where(bump_on, mat.bump_amp, 0.0)
        offset = (
            (amp * jnp.sin(mat.bump_scale * ph1))[:, None] * t1
            + (amp * jnp.sin(mat.bump_scale * ph2))[:, None] * t2
        )
        n_bumped = n0 + offset
        n_bumped = n_bumped / jnp.linalg.norm(n_bumped, axis=-1, keepdims=True).clip(1e-12)
        hit = _dc.replace(hit, normal=jnp.where(bump_on[:, None], n_bumped, n0))

    # medium state is [N, 4] (sigma_a rgb, sigma_s) — or [N, 5] with the
    # Henyey-Greenstein g appended when the "hg" feature is active.  The
    # width is feature-dependent because the g column rides every engine
    # carry / compaction permute: paying it on PHASE-free scenes cost a
    # measured ~7% of forward throughput.
    if medium_sigma is None:
        width = 5 if "hg" in cfg.features else 4
        medium_sigma = jnp.zeros((throughput.shape[0], width), throughput.dtype)
    sigma_a = medium_sigma[:, 0:3]
    sigma_s = medium_sigma[:, 3]
    wide_medium = medium_sigma.shape[1] > 4
    medium_g = medium_sigma[:, 4] if wide_medium else jnp.zeros_like(sigma_s)

    u = bounce_uniforms(base_key, sample_idx, depth, cfg.fast_rng)

    has_vol = "volumetric" in cfg.features
    if has_vol:
        # ---- volumetric free path: distance to the next scatter event;
        # effectively infinite in non-scattering media
        free_path = jnp.where(
            sigma_s > 0.0,
            -jnp.log(jnp.clip(1.0 - jax.lax.stop_gradient(u[:, 8]), 1e-7, 1.0))
            / jnp.maximum(sigma_s, 1e-12),
            jnp.float32(1e30),
        )
        vol_scatter = hit.hit & (free_path < hit.t)

        # Beer-Lambert attenuation over the segment actually traveled
        seg = jnp.where(vol_scatter, free_path, jnp.where(hit.hit, hit.t, 0.0))
        atten = jnp.exp(-sigma_a * seg[:, None])
        throughput = throughput * atten
    else:
        # feature-gated off: vacuum transport (exactly what zero sigmas
        # compute, minus the exp/log ops and their transposes)
        free_path = jnp.full(sigma_s.shape, 1e30, jnp.float32)
        vol_scatter = jnp.zeros(sigma_s.shape, bool)
        atten = jnp.ones_like(throughput)

    # ---- emittance on BSDF hit.  With NEE, count only where no NEE could
    # have sampled this light: primary rays and post-specular bounces —
    # state 1 of the 3-state emit code (state 2, the post-scatter
    # specular chain, is covered by the volumetric NEE below).
    prev_state = prev_specular.astype(jnp.float32)
    if cfg.nee:
        count_emit = (jnp.asarray(depth) == 0) | (
            jnp.abs(prev_state - 1.0) < 0.5
        )
        count_emit = jnp.broadcast_to(count_emit, emissive.shape)
    else:
        count_emit = jnp.ones_like(emissive)
    emitted = throughput * mat.color * mat.emittance[:, None]
    contrib = jnp.where(
        (hit.hit & emissive & count_emit & (~vol_scatter))[:, None], emitted, 0.0
    )

    # ---- BSDF continuation sample
    scatter = sample_bsdf(
        mat, hit.position, hit.normal, rays.direction, u[:, 0:3],
        glossy="glossy" in cfg.features,
        microfacet="microfacet" in cfg.features,
        ward="ward" in cfg.features,
    )

    # ---- next-event estimation at diffuse hits
    if cfg.nee:
        ls = sample_lights(scene.geoms, scene.materials, u[:, 4:8])
        n_shade = hit.normal * jnp.sign(
            -jnp.sum(hit.normal * rays.direction, axis=-1, keepdims=True)
        )
        x = hit.position + RAY_BIAS * n_shade
        to_light = ls.position - x
        dist2 = jnp.sum(to_light * to_light, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        wi = to_light / dist[:, None]
        cos_x = jnp.sum(n_shade * wi, axis=-1)
        cos_y = jnp.sum(ls.normal * (-wi), axis=-1)
        diffuse_lane = hit.hit & (~emissive) & (~scatter.is_specular) & (~vol_scatter)
        candidate = diffuse_lane & ls.valid & (cos_x > 0) & (cos_y > 0)

        # shadow ray (the second intersect sweep of the bounce); with
        # pallas, a distance-only occlusion kernel (no hit frame needed).
        # Visibility is boolean — zero gradient by construction — so in
        # grad_lean mode the whole query runs on detached inputs (no
        # residuals, no transpose, and the Pallas kernel needs no JVP).
        if cfg.grad_lean:
            from pathtracer_tpu.ops.intersect import occlusion_t

            sg = jax.lax.stop_gradient
            shadow = Rays(origin=sg(x), direction=sg(wi))
            geoms_sg = jax.tree_util.tree_map(sg, scene.geoms)
            meshes_sg = jax.tree_util.tree_map(sg, scene.meshes)
            if use_pallas:
                from pathtracer_tpu.ops.intersect_pallas import (
                    occlusion_scene_pallas,
                )

                occ_t = occlusion_scene_pallas(
                    shadow, geoms_sg, meshes_sg, interpret=interp_all
                )
            else:
                occ_t = occlusion_t(shadow, geoms_sg, meshes_sg)
            # saved by the per-bounce remat policy (megakernel.py) so the
            # backward never re-runs the occlusion sweep
            from jax.ad_checkpoint import checkpoint_name

            occ_t = checkpoint_name(occ_t, "lean_winner")
            visible = occ_t >= sg(dist) - 4.0 * RAY_BIAS
        elif use_pallas:
            shadow = Rays(origin=x, direction=wi)
            occ_t = occlusion_scene_pallas(
                shadow, scene.geoms, scene.meshes, interpret=interp
            )
            visible = occ_t >= dist - 4.0 * RAY_BIAS
        else:
            shadow = Rays(origin=x, direction=wi)
            occ = intersect_scene(shadow, scene.geoms, scene.meshes)
            visible = (~occ.hit) | (occ.t >= dist - 4.0 * RAY_BIAS)

        g = cos_x * cos_y / jnp.maximum(dist2, 1e-12)
        nee = (
            throughput
            * (mat.color / jnp.pi)
            * ls.emitted
            * (g / jnp.maximum(ls.pdf_area, 1e-20))[:, None]
        )
        contrib = contrib + jnp.where(
            (candidate & visible)[:, None], nee, 0.0
        )

    # emit-state code of this bounce (see BounceResult.was_specular):
    # surface events: specular continues a suppressed chain (2 -> 2),
    # otherwise 1; diffuse resets to 0
    surf_state = jnp.where(
        scatter.is_specular,
        jnp.where(jnp.abs(prev_state - 2.0) < 0.5, 2.0, 1.0),
        0.0,
    )

    terminate = (~hit.hit) | (emissive & (~vol_scatter))
    if not has_vol:
        return BounceResult(
            contrib=contrib,
            next_origin=scatter.origin,
            next_direction=scatter.direction,
            throughput_mult=scatter.throughput_mult,
            terminate=terminate,
            was_specular=surf_state,
            rr_uniform=u[:, 3],
            next_medium=medium_sigma,
        )

    # ---- in-medium scatter event: phase-sampled continuation at the
    # sampled interior point, staying in the same medium
    from pathtracer_tpu.ops.bsdf import henyey_greenstein, uniform_sphere

    vol_pos = rays.origin + free_path[:, None] * rays.direction
    if "hg" in cfg.features:
        # anisotropic Henyey-Greenstein phase about the propagation
        # direction (PHASE g in the DSL).  Selected PER LANE against the
        # world-frame uniform-sphere sample so g == 0 lanes stay
        # bit-exact with the "hg"-off path: HG at g = 0 maps the same
        # uniforms through a tangent frame about rays.direction — the
        # same distribution but different realized samples — which would
        # make enabling the feature a non-no-op on volumetric scenes
        # (ADVICE r3; the ALL_FEATURES no-op invariant, diff.py).
        hg_dir = henyey_greenstein(rays.direction, medium_g, u[:, 9], u[:, 10])
        iso_dir = uniform_sphere(u[:, 9], u[:, 10])
        vol_dir = jnp.where((medium_g != 0.0)[:, None], hg_dir, iso_dir)
    else:
        vol_dir = uniform_sphere(u[:, 9], u[:, 10])

    surf_medium = jnp.concatenate(
        [
            jnp.where(
                scatter.transmitted[:, None],
                jnp.where(scatter.entering[:, None], mat.absorption, 0.0),
                sigma_a,
            ),
            jnp.where(
                scatter.transmitted,
                jnp.where(
                    scatter.entering,
                    mat.has_scatter * mat.scatter_coeff,
                    0.0,
                ),
                sigma_s,
            )[:, None],
        ]
        + (
            [
                jnp.where(
                    scatter.transmitted,
                    jnp.where(scatter.entering, mat.phase_g, 0.0),
                    medium_g,
                )[:, None]
            ]
            if wide_medium
            else []
        ),
        axis=-1,
    )

    # ---- volumetric NEE (VERDICT r3 #6): direct light at the in-medium
    # scatter point — area-sampled light point (the SAME sample as the
    # surface NEE: vol and surface lanes are disjoint), phase-function
    # weight, and straight-line transmittance through the medium.
    # Refractive interfaces do not block the shadow ray; the segment
    # inside the current medium attenuates by exp(-sigma_t * s).  This
    # ignores the interface's refraction bend and Fresnel loss — the
    # documented approximation that turns the pure-path-tracing
    # estimator (light only via chance boundary hits) into one that
    # converges at a fraction of the spp.  The suppressed emit state (2)
    # prevents the following specular chain from double-counting the
    # same connection.
    vol_state = jnp.full(vol_scatter.shape, 1.0, jnp.float32)
    if cfg.nee and cfg.vol_nee:
        from pathtracer_tpu.ops.bsdf import hg_phase_value
        from pathtracer_tpu.ops.intersect import occlusion_split_t

        to_l = ls.position - vol_pos
        d2v = jnp.sum(to_l * to_l, axis=-1)
        distv = jnp.sqrt(jnp.maximum(d2v, 1e-12))
        wiv = to_l / distv[:, None]
        cos_yv = jnp.sum(ls.normal * (-wiv), axis=-1)
        cand_v = vol_scatter & ls.valid & (cos_yv > 0)

        sg = jax.lax.stop_gradient
        shadow_v = Rays(origin=sg(vol_pos), direction=sg(wiv))
        geoms_sg = jax.tree_util.tree_map(sg, scene.geoms)
        meshes_sg = jax.tree_util.tree_map(sg, scene.meshes)
        t_opaque, t_boundary = occlusion_split_t(
            shadow_v, geoms_sg, scene.materials, meshes_sg
        )
        t_opaque = jax.lax.stop_gradient(t_opaque)
        t_boundary = jax.lax.stop_gradient(t_boundary)
        visible_v = t_opaque >= sg(distv) - 4.0 * RAY_BIAS
        seg_v = jnp.minimum(t_boundary, distv)
        sigma_t = sigma_a + sigma_s[:, None]
        transmit = jnp.exp(-sigma_t * seg_v[:, None])
        cos_th = jnp.sum(rays.direction * wiv, axis=-1)
        if "hg" in cfg.features:
            phase = hg_phase_value(medium_g, cos_th)
        else:
            phase = jnp.full(cos_th.shape, 1.0 / (4.0 * jnp.pi))
        vol_nee = (
            throughput
            * transmit
            * ls.emitted
            * (phase * cos_yv / jnp.maximum(d2v, 1e-12)
               / jnp.maximum(ls.pdf_area, 1e-20))[:, None]
        )
        contrib = contrib + jnp.where(
            (cand_v & visible_v)[:, None], vol_nee, 0.0
        )
        # suppressed chain only when NEE actually estimated the
        # connection; geometrically-invisible scatter points keep the
        # old emittance-only estimator (state 1)
        vol_state = jnp.where(cand_v & visible_v, 2.0, 1.0)

    vs = vol_scatter[:, None]
    return BounceResult(
        contrib=contrib,
        next_origin=jnp.where(vs, vol_pos, scatter.origin),
        next_direction=jnp.where(vs, vol_dir, scatter.direction),
        throughput_mult=jnp.where(
            vs, atten, atten * scatter.throughput_mult
        ),
        terminate=terminate,
        was_specular=jnp.where(vol_scatter, vol_state, surf_state),
        rr_uniform=u[:, 3],
        next_medium=jnp.where(vs, medium_sigma, surf_medium),
    )
