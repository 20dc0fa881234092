"""Pallas fused intersection kernels vs the XLA sweep (interpret mode on
the CPU backend — kernel logic check per SURVEY.md §5 "Pallas
interpreter-mode checks").  The same kernels compile via Mosaic on TPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops.intersect import intersect_scene
from pathtracer_tpu.ops.intersect_pallas import (
    intersect_scene_pallas,
    occlusion_scene_pallas,
)
from pathtracer_tpu.scene.structs import Rays


def _random_rays(n, seed=0, spread=2.0):
    o = jax.random.normal(jax.random.PRNGKey(seed), (n, 3)) * spread
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(origin=o, direction=d)


@pytest.mark.parametrize("n", [37, 1024])  # non-multiple-of-tile + aligned
@pytest.mark.slow
def test_nearest_hit_matches_xla_sweep(cornell_scene, n):
    rays = _random_rays(n)
    ref = intersect_scene(rays, cornell_scene.geoms, cornell_scene.meshes)
    out = intersect_scene_pallas(
        rays, cornell_scene.geoms, cornell_scene.meshes, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(ref.t)[m], np.asarray(out.t)[m], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(ref.geom_id)[m], np.asarray(out.geom_id)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(ref.material_id)[m], np.asarray(out.material_id)[m]
    )
    for f in ("position", "position_obj", "normal"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f))[m],
            np.asarray(getattr(out, f))[m],
            rtol=1e-4,
            atol=1e-4,
        )


def test_occlusion_matches_nearest_t(cornell_scene):
    rays = _random_rays(513, seed=7)
    ref = intersect_scene(rays, cornell_scene.geoms, cornell_scene.meshes)
    t = occlusion_scene_pallas(
        rays, cornell_scene.geoms, cornell_scene.meshes, interpret=True
    )
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(ref.t)[m], np.asarray(t)[m], rtol=1e-5, atol=1e-5
    )
    assert np.all(np.asarray(t)[~m] > 1e29)


@pytest.mark.slow
def test_mesh_scene_pallas_merge():
    """Pallas analytic kernel + mesh merge == XLA path on a mesh scene."""
    import os

    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "mesh_demo.txt")
    scene = load_scene(path).scene_for_frame(0)
    rays = _random_rays(256, seed=3, spread=4.0)
    ref = intersect_scene(rays, scene.geoms, scene.meshes)
    out = intersect_scene_pallas(rays, scene.geoms, scene.meshes, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(ref.t)[m], np.asarray(out.t)[m], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(ref.geom_id)[m], np.asarray(out.geom_id)[m]
    )
    np.testing.assert_allclose(
        np.asarray(ref.normal)[m], np.asarray(out.normal)[m], rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_full_render_pallas_vs_xla(cornell_small):
    """End-to-end: a small wavefront render with cfg.pallas on (interpret)
    equals the XLA-sweep render to fp32 accumulation tolerance."""
    from pathtracer_tpu.render.integrator import render

    base = RenderConfig(wavefront=True, nee=True, max_depth=4, iters_per_launch=2)
    img_ref, acc_ref, _ = render(cornell_small, 2, dataclasses.replace(base, pallas=False))
    img_pal, acc_pal, _ = render(cornell_small, 2, dataclasses.replace(base, pallas=True))
    np.testing.assert_allclose(
        np.asarray(acc_ref), np.asarray(acc_pal), rtol=1e-3, atol=1e-3
    )


@pytest.mark.slow
def test_fused_bounce_mesh_merge_matches_split_path():
    """The mesh-merge variant of the fused bounce kernel (triangles
    intersected by the XLA chunked-LBVH outside, winner merged in-kernel,
    NEE shadow ray's triangle occlusion resolved outside) equals the split
    shade_bounce on a scene with MESH instances, NEE on and off."""
    import os

    from pathtracer_tpu.render.common import shade_bounce
    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "mesh_demo.txt")
    scene = load_scene(path).scene_for_frame(0)
    assert scene.meshes, "mesh_demo.txt must carry MESH instances"
    n = 512
    key = jax.random.PRNGKey(11)
    o = jax.random.normal(jax.random.PRNGKey(20), (n, 3)) * 4.0
    d = jax.random.normal(jax.random.PRNGKey(21), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(origin=o, direction=d)
    tp = jax.random.uniform(jax.random.PRNGKey(22), (n, 3), minval=0.2, maxval=1.0)
    si = jax.random.randint(jax.random.PRNGKey(23), (n,), 0, 10_000_000, jnp.int32)
    dep = jax.random.randint(jax.random.PRNGKey(24), (n,), 0, 8, jnp.int32)
    ps = jax.random.bernoulli(jax.random.PRNGKey(25), 0.3, (n,))
    med = jnp.zeros((n, 5), jnp.float32)

    # no "volumetric": mesh scenes with scattering media take the split
    # path (volumetric NEE's mesh occlusion is not deferred); this test
    # pins the fused mesh-merge against the split path on the features
    # the merge kernel covers
    feats = ("texture", "bump", "glossy")
    for nee in (True, False):
        ref = shade_bounce(
            scene, rays, tp, si, dep, ps, key,
            RenderConfig(nee=nee, pallas=False, fused=False, features=feats),
            medium_sigma=med,
        )
        fus = shade_bounce(
            scene, rays, tp, si, dep, ps, key,
            RenderConfig(nee=nee, pallas=True, fused=True, features=feats),
            medium_sigma=med,
        )
        np.testing.assert_array_equal(
            np.asarray(ref.terminate), np.asarray(fus.terminate)
        )
        live = ~np.asarray(ref.terminate)
        for f in (
            "contrib", "next_origin", "next_direction",
            "throughput_mult", "next_medium",
        ):
            np.testing.assert_allclose(
                np.asarray(getattr(ref, f))[live],
                np.asarray(getattr(fus, f))[live],
                rtol=2e-4, atol=2e-5,
                err_msg=f"{f} (nee={nee})",
            )


@pytest.mark.slow
def test_fused_bounce_matches_split_path(cornell_scene):
    """The fully-fused bounce megakernel (ops/bounce_pallas.py) equals the
    split shade_bounce on every live lane, across all material lobes,
    NEE on/off, volumetric media, and varied depth/prev_spec state.
    (Terminated lanes carry don't-care continuation values.)"""
    import jax

    from pathtracer_tpu.render.common import shade_bounce

    scene = cornell_scene
    n = 1024
    key = jax.random.PRNGKey(7)
    o = jax.random.normal(jax.random.PRNGKey(0), (n, 3)) * 3.0
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(origin=o, direction=d)
    tp = jax.random.uniform(jax.random.PRNGKey(2), (n, 3), minval=0.2, maxval=1.0)
    si = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, 10_000_000, jnp.int32)
    dep = jax.random.randint(jax.random.PRNGKey(4), (n,), 0, 8, jnp.int32)
    ps = jax.random.bernoulli(jax.random.PRNGKey(5), 0.3, (n,))
    med = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(6), 0.3, (n, 1)),
        jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (n, 4))) * 0.5,
        0.0,
    )

    for nee in (True, False):
        ref = shade_bounce(
            scene, rays, tp, si, dep, ps, key,
            RenderConfig(nee=nee, pallas=False, fused=False), medium_sigma=med,
        )
        fus = shade_bounce(
            scene, rays, tp, si, dep, ps, key,
            RenderConfig(nee=nee, pallas=True, fused=True), medium_sigma=med,
        )
        np.testing.assert_array_equal(
            np.asarray(ref.terminate), np.asarray(fus.terminate)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.was_specular), np.asarray(fus.was_specular)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.rr_uniform), np.asarray(fus.rr_uniform)
        )
        live = ~np.asarray(ref.terminate)
        for f in (
            "contrib", "next_origin", "next_direction",
            "throughput_mult", "next_medium",
        ):
            np.testing.assert_allclose(
                np.asarray(getattr(ref, f))[live],
                np.asarray(getattr(fus, f))[live],
                rtol=2e-4, atol=2e-5,
                err_msg=f"{f} (nee={nee})",
            )


@pytest.mark.slow
def test_fused_bounce_matches_split_path_ct_ward_hg():
    """r4 feature extension: Cook-Torrance GGX, Ward anisotropic, and
    Henyey-Greenstein phase run inside the fused kernel — equal to the
    split path on every live lane (interpret mode is bit-domain: same
    jaxpr arithmetic)."""
    import os

    from pathtracer_tpu.render.common import shade_bounce
    from pathtracer_tpu.render.diff import resolve_features
    from pathtracer_tpu.scene.parser import load_scene

    for scene_file, med_g in (("ward.txt", 0.0), ("sss.txt", 0.7)):
        path = os.path.join(
            os.path.dirname(__file__), "..", "scenes", scene_file
        )
        scene = load_scene(path).scene_for_frame(0)
        n = 512
        key = jax.random.PRNGKey(31)
        o = jax.random.normal(jax.random.PRNGKey(40), (n, 3)) * 3.0
        d = jax.random.normal(jax.random.PRNGKey(41), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(origin=o, direction=d)
        tp = jax.random.uniform(
            jax.random.PRNGKey(42), (n, 3), minval=0.2, maxval=1.0
        )
        si = jax.random.randint(
            jax.random.PRNGKey(43), (n,), 0, 10_000_000, jnp.int32
        )
        dep = jax.random.randint(jax.random.PRNGKey(44), (n,), 0, 8, jnp.int32)
        ps = jax.random.bernoulli(jax.random.PRNGKey(45), 0.3, (n,))
        # defaults (incl. volumetric — the test feeds nonzero media) plus
        # whatever the scene's materials require, pinned on BOTH paths
        from pathtracer_tpu.render.diff import features_for_materials

        feats = tuple(
            dict.fromkeys(
                RenderConfig().features + features_for_materials(scene.materials)
            )
        )
        base = RenderConfig(features=feats, auto_features=False)
        width = 5 if "hg" in base.features else 4
        med = jnp.where(
            jax.random.bernoulli(jax.random.PRNGKey(46), 0.4, (n, 1)),
            jnp.abs(jax.random.normal(jax.random.PRNGKey(47), (n, width))) * 0.5,
            0.0,
        )
        if width == 5:
            med = med.at[:, 4].set(
                jnp.where(med[:, 3] > 0, jnp.float32(med_g), 0.0)
            )

        ref = shade_bounce(
            scene, rays, tp, si, dep, ps, key,
            dataclasses.replace(base, nee=True, pallas=False, fused=False),
            medium_sigma=med,
        )
        fus = shade_bounce(
            scene, rays, tp, si, dep, ps, key,
            dataclasses.replace(base, nee=True, pallas=True, fused=True),
            medium_sigma=med,
        )
        np.testing.assert_array_equal(
            np.asarray(ref.terminate), np.asarray(fus.terminate),
            err_msg=scene_file,
        )
        live = ~np.asarray(ref.terminate)
        for f in (
            "contrib", "next_origin", "next_direction",
            "throughput_mult", "next_medium",
        ):
            np.testing.assert_allclose(
                np.asarray(getattr(ref, f))[live],
                np.asarray(getattr(fus, f))[live],
                rtol=6e-4, atol=1e-4,
                err_msg=f"{f} ({scene_file})",
            )


@pytest.mark.slow
def test_fused_bounce_mesh_vol_nee_matches_split_path():
    """r5: mesh scenes with scattering media stay FUSED — the volumetric
    NEE shadow ray's refractive/opaque triangle split runs in-kernel
    (mesh_occ_split_planes) instead of forcing the split path."""
    import os

    from pathtracer_tpu.render.common import shade_bounce
    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(
        os.path.dirname(__file__), "..", "scenes", "smooth_mesh.txt"
    )
    scene = load_scene(path).scene_for_frame(0)
    assert scene.meshes
    n = 512
    key = jax.random.PRNGKey(53)
    o = jax.random.normal(jax.random.PRNGKey(80), (n, 3)) * 3.0
    d = jax.random.normal(jax.random.PRNGKey(81), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(origin=o, direction=d)
    tp = jax.random.uniform(jax.random.PRNGKey(82), (n, 3), minval=0.2, maxval=1.0)
    si = jax.random.randint(jax.random.PRNGKey(83), (n,), 0, 10_000_000, jnp.int32)
    dep = jax.random.randint(jax.random.PRNGKey(84), (n,), 0, 8, jnp.int32)
    ps = jax.random.bernoulli(jax.random.PRNGKey(85), 0.3, (n,))
    # dense scattering medium on every lane (injected — pin the default
    # feature tuple so both paths model volumetrics)
    med = jnp.broadcast_to(
        jnp.asarray([0.2, 0.15, 0.1, 1.5], jnp.float32), (n, 4)
    )
    base = RenderConfig(auto_features=False)

    ref = shade_bounce(
        scene, rays, tp, si, dep, ps, key,
        dataclasses.replace(base, nee=True, pallas=False, fused=False),
        medium_sigma=med,
    )
    fus = shade_bounce(
        scene, rays, tp, si, dep, ps, key,
        dataclasses.replace(base, nee=True, pallas=True, fused=True),
        medium_sigma=med,
    )
    live = ~np.asarray(ref.terminate)
    for f in ("contrib", "next_origin", "next_direction",
              "throughput_mult", "next_medium"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f))[live],
            np.asarray(getattr(fus, f))[live],
            rtol=6e-4, atol=1e-4,
            err_msg=f,
        )


@pytest.mark.slow
def test_fused_bounce_texel_not_applied_to_vol_nee():
    """A lane that scatters in-medium BEFORE an image-textured winner has
    no surface event: its vol-NEE contrib must NOT be scaled by that
    surface's texel (ADVICE r4 medium — the deferred slot is retracted on
    vol-scatter lanes in the kernel)."""
    import os

    from pathtracer_tpu.render.common import shade_bounce
    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(
        os.path.dirname(__file__), "..", "scenes", "textured_image.txt"
    )
    scene = load_scene(path).scene_for_frame(0)
    assert scene.textures is not None and not scene.meshes
    n = 512
    key = jax.random.PRNGKey(52)
    o = jax.random.normal(jax.random.PRNGKey(70), (n, 3)) * 3.0
    d = jax.random.normal(jax.random.PRNGKey(71), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(origin=o, direction=d)
    tp = jax.random.uniform(jax.random.PRNGKey(72), (n, 3), minval=0.2, maxval=1.0)
    si = jax.random.randint(jax.random.PRNGKey(73), (n,), 0, 10_000_000, jnp.int32)
    dep = jax.random.randint(jax.random.PRNGKey(74), (n,), 0, 8, jnp.int32)
    ps = jax.random.bernoulli(jax.random.PRNGKey(75), 0.3, (n,))
    # every lane travels a dense scattering medium: a large fraction
    # vol-scatters in front of the textured winners.  The medium state is
    # injected (no SCATTER material in the scene), so the "volumetric"
    # feature must be pinned — the default tuple carries it.
    med = jnp.broadcast_to(
        jnp.asarray([0.3, 0.2, 0.1, 2.0], jnp.float32), (n, 4)
    )
    base = RenderConfig(auto_features=False)

    ref = shade_bounce(
        scene, rays, tp, si, dep, ps, key,
        dataclasses.replace(base, nee=True, pallas=False, fused=False),
        medium_sigma=med,
    )
    fus = shade_bounce(
        scene, rays, tp, si, dep, ps, key,
        dataclasses.replace(base, nee=True, pallas=True, fused=True),
        medium_sigma=med,
    )
    live = ~np.asarray(ref.terminate)
    for f in ("contrib", "throughput_mult", "next_medium"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f))[live],
            np.asarray(getattr(fus, f))[live],
            rtol=6e-4, atol=1e-4,
            err_msg=f,
        )


@pytest.mark.slow
def test_fused_bounce_matches_split_path_image_textures():
    """r4: image-texture scenes run the fused kernel with the texel
    DEFERRED to the wrapper (albedo enters contrib and the diffuse
    throughput linearly) — equal to the split path, including authored
    mesh UVs when present."""
    import os

    from pathtracer_tpu.render.common import shade_bounce
    from pathtracer_tpu.render.diff import resolve_features
    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(
        os.path.dirname(__file__), "..", "scenes", "textured_image.txt"
    )
    scene = load_scene(path).scene_for_frame(0)
    assert scene.textures is not None
    n = 512
    key = jax.random.PRNGKey(51)
    o = jax.random.normal(jax.random.PRNGKey(60), (n, 3)) * 3.0
    d = jax.random.normal(jax.random.PRNGKey(61), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(origin=o, direction=d)
    tp = jax.random.uniform(jax.random.PRNGKey(62), (n, 3), minval=0.2, maxval=1.0)
    si = jax.random.randint(jax.random.PRNGKey(63), (n,), 0, 10_000_000, jnp.int32)
    dep = jax.random.randint(jax.random.PRNGKey(64), (n,), 0, 8, jnp.int32)
    ps = jax.random.bernoulli(jax.random.PRNGKey(65), 0.3, (n,))
    med = jnp.zeros((n, 4), jnp.float32)
    base = resolve_features(RenderConfig(), scene.materials)

    ref = shade_bounce(
        scene, rays, tp, si, dep, ps, key,
        dataclasses.replace(base, nee=True, pallas=False, fused=False),
        medium_sigma=med,
    )
    fus = shade_bounce(
        scene, rays, tp, si, dep, ps, key,
        dataclasses.replace(base, nee=True, pallas=True, fused=True),
        medium_sigma=med,
    )
    np.testing.assert_array_equal(
        np.asarray(ref.terminate), np.asarray(fus.terminate)
    )
    live = ~np.asarray(ref.terminate)
    for f in (
        "contrib", "next_origin", "next_direction",
        "throughput_mult", "next_medium",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f))[live],
            np.asarray(getattr(fus, f))[live],
            rtol=6e-4, atol=1e-4,
            err_msg=f,
        )
