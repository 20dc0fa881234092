"""End-to-end render tests: furnace/property tests, engine equivalence,
GI color bleed (the reference's GI_yes/GI_no distinction, SURVEY.md §4.3),
determinism and exact resume."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.structs import (
    CUBE,
    SPHERE,
    Camera,
    Geoms,
    Materials,
    Scene,
    make_materials,
)
from pathtracer_tpu.ops.camera import derive_fov
from pathtracer_tpu.ops.transforms import build_transform


def _small(scene, res=(32, 32)):
    return dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, resolution=res)
    )


def _mat(color=(1, 1, 1), emittance=0.0, refl=0.0, refr=0.0, ior=0.0):
    return {
        "color": list(color),
        "specular_exponent": 0.0,
        "specular_color": [1.0, 1.0, 1.0],
        "has_reflective": refl,
        "has_refractive": refr,
        "index_of_refraction": ior,
        "has_scatter": 0.0,
        "absorption_coefficient": [0.0, 0.0, 0.0],
        "reduced_scatter_coefficient": 0.0,
        "emittance": emittance,
    }


def _scene(geom_specs, materials, res=(16, 16), eye=(0, 0, 0), view=(0, 0, -1)):
    t, inv = build_transform(
        np.array([g[1] for g in geom_specs], np.float32),
        np.array([g[2] for g in geom_specs], np.float32),
        np.array([g[3] for g in geom_specs], np.float32),
    )
    geoms = Geoms(
        type=jnp.asarray(np.array([g[0] for g in geom_specs], np.int32)),
        material_id=jnp.asarray(np.array([g[4] for g in geom_specs], np.int32)),
        transform=t,
        inv_transform=inv,
    )
    cam = Camera(
        resolution=res,
        position=jnp.asarray(eye, jnp.float32),
        view=jnp.asarray(view, jnp.float32),
        up=jnp.asarray([0, 1, 0], jnp.float32),
        fov=jnp.asarray(derive_fov(45.0, *res), jnp.float32),
        aperture=jnp.asarray(0.0, jnp.float32),
        focal_distance=jnp.asarray(0.0, jnp.float32),
    )
    return Scene(geoms=geoms, materials=make_materials(materials), camera=cam)


def test_furnace_emissive_enclosure():
    """Camera inside a big emissive cube: every primary ray hits the light
    => image is exactly color * emittance, flat."""
    sc = _scene(
        [(CUBE, [0, 0, 0], [0, 0, 0], [20, 20, 20], 0)],
        [_mat(color=(0.5, 0.25, 1.0), emittance=2.0)],
    )
    img, accum, _ = render(sc, 4, RenderConfig(max_depth=3, iters_per_launch=4))
    flat = np.asarray(accum) / 4.0
    np.testing.assert_allclose(flat[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(flat[:, 1], 0.5, atol=1e-5)
    np.testing.assert_allclose(flat[:, 2], 2.0, atol=1e-5)


def test_miss_is_black():
    sc = _scene(
        [(SPHERE, [0, 0, -100], [0, 0, 0], [0.1, 0.1, 0.1], 0)],
        [_mat(emittance=1.0)],
    )
    img, accum, _ = render(sc, 2, RenderConfig(max_depth=2, iters_per_launch=2))
    a = np.asarray(accum).reshape(16, 16, 3)
    assert a[0, 0].sum() == 0.0  # corner rays miss


def test_direct_light_visibility_depth1():
    """depth=1: only direct light hits contribute (the basecode's
    traceDepth=1 behavior, raytraceKernel.cu:166, with emittance)."""
    sc = _scene(
        [
            (SPHERE, [0, 0, -5], [0, 0, 0], [2, 2, 2], 0),  # light ball ahead
        ],
        [_mat(color=(1, 1, 1), emittance=3.0)],
    )
    img, accum, _ = render(sc, 4, RenderConfig(max_depth=1, iters_per_launch=4, jitter=False))
    a = np.asarray(accum).reshape(16, 16, 3) / 4.0
    assert a[8, 8, 0] == pytest.approx(3.0, abs=1e-5)  # center sees the light
    assert a[0, 0].sum() == 0.0


def test_engines_agree(cornell_small):
    cfgm = RenderConfig(wavefront=False, max_depth=6, iters_per_launch=16)
    cfgw = RenderConfig(
        wavefront=True, max_depth=6, iters_per_launch=16, wavefront_capacity=1 << 12
    )
    im, am, sm = render(cornell_small, 32, cfgm)
    iw, aw, sw = render(cornell_small, 32, cfgw)
    # shared RNG contract: both engines compute the SAME per-sample
    # estimates, so accumulators match to float addition-order tolerance
    np.testing.assert_allclose(np.asarray(am), np.asarray(aw), rtol=2e-4, atol=2e-4)
    assert sm["rays_traced"] == sw["rays_traced"]


def test_wavefront_capacity_invariance(cornell_small):
    """Lane randomness is keyed by global sample index, so results are a
    pure function of the sample set — capacity must not matter."""
    base = dict(wavefront=True, max_depth=4, iters_per_launch=8)
    _, a1, _ = render(cornell_small, 8, RenderConfig(wavefront_capacity=1 << 10, **base))
    _, a2, _ = render(cornell_small, 8, RenderConfig(wavefront_capacity=1 << 13, **base))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4, atol=1e-4)


def test_gi_color_bleed(cornell_small):
    """The GI_yes/GI_no distinction (reference renders/): indirect light
    tints the white sphere side facing a colored wall."""
    img, accum, _ = render(
        cornell_small, 96, RenderConfig(max_depth=6, iters_per_launch=32)
    )
    h, w = cornell_small.camera.height, cornell_small.camera.width
    a = np.asarray(accum).reshape(h, w, 3)
    # left/right edge strips (red / green wall regions)
    left = a[h // 4 : 3 * h // 4, 1 : w // 6].mean(axis=(0, 1))
    right = a[h // 4 : 3 * h // 4, -w // 6 : -1].mean(axis=(0, 1))
    assert left[0] > 1.5 * left[1], f"left wall not red-dominant: {left}"
    assert right[1] > 1.5 * right[0], f"right wall not green-dominant: {right}"
    # some energy everywhere on the walls (GI, not direct-only)
    assert (a.reshape(-1, 3).sum(-1) > 0).mean() > 0.9


def test_determinism_same_seed(cornell_small):
    cfg = RenderConfig(max_depth=4, iters_per_launch=4)
    _, a1, _ = render(cornell_small, 4, cfg)
    _, a2, _ = render(cornell_small, 4, cfg)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_exact_resume(cornell_small):
    """render(8) == render(4) then resume for 4 more — bitwise, because the
    per-iteration keys are a pure function of (seed, iteration)."""
    cfg = RenderConfig(max_depth=4, iters_per_launch=4)
    _, full, _ = render(cornell_small, 8, cfg)
    _, half, _ = render(cornell_small, 4, cfg)
    _, resumed, _ = render(cornell_small, 4, cfg, accum=half, start_iteration=4)
    np.testing.assert_allclose(np.asarray(full), np.asarray(resumed), atol=1e-5)


def test_specular_mirror_reflects_light():
    """A mirror floor under a light: depth-2 paths see the light in the
    reflection (perfect specular requirement, README.md:53)."""
    sc = _scene(
        [
            (CUBE, [0, -2, -5], [0, 0, 0], [10, 0.2, 10], 0),  # mirror slab
            (SPHERE, [0, 3, -5], [0, 0, 0], [1.5, 1.5, 1.5], 1),  # light above
        ],
        [_mat(color=(0, 0, 0), refl=1.0), _mat(emittance=5.0)],
        view=(0, -0.45, -1),
    )
    img, accum, _ = render(sc, 16, RenderConfig(max_depth=3, iters_per_launch=16))
    a = np.asarray(accum).reshape(16, 16, 3) / 16.0
    assert a.max() > 1.0  # the mirrored light is visible somewhere
