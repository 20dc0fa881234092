"""Image-file texture mapping (ops/texture.py) — the stb_image elective
(reference src/stb_image/stb_image.c, README.md:57-58): UV mapping, the
bilinear atlas sampler, the DSL ``TEXTURE file.png <scale>`` extension,
an end-to-end textured render, and texel gradients."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops.texture import (
    TextureAtlas,
    build_atlas,
    compute_uv,
    sample_atlas,
)
from pathtracer_tpu.scene.structs import CUBE, MESH, SPHERE

SCENE = os.path.join(
    os.path.dirname(__file__), "..", "scenes", "textured_image.txt"
)


def test_compute_uv_cube_faces():
    # front face (z dominant): u = px+.5 (right), v = py+.5 (up)
    uv = compute_uv(
        jnp.asarray([CUBE]),
        jnp.asarray([[-0.25, 0.25, 0.5]]),
        jnp.asarray([[0.0, 0.0, 1.0]]),
    )
    np.testing.assert_allclose(np.asarray(uv), [[0.25, 0.75]], atol=1e-6)
    # +x face (x dominant): u = pz+.5, v = py+.5
    uv = compute_uv(
        jnp.asarray([CUBE]),
        jnp.asarray([[0.5, -0.1, 0.3]]),
        jnp.asarray([[1.0, 0.0, 0.0]]),
    )
    np.testing.assert_allclose(np.asarray(uv), [[0.8, 0.4]], atol=1e-6)
    # top face (y dominant): u = px+.5, v = pz+.5
    uv = compute_uv(
        jnp.asarray([CUBE]),
        jnp.asarray([[0.2, 0.5, -0.4]]),
        jnp.asarray([[0.0, 1.0, 0.0]]),
    )
    np.testing.assert_allclose(np.asarray(uv), [[0.7, 0.1]], atol=1e-6)


def test_compute_uv_sphere():
    g = jnp.asarray([SPHERE])
    n = jnp.zeros((1, 3))
    # +x equator point: u = 0.5 (atan2(0, .5) = 0), v = 0.5
    uv = compute_uv(g, jnp.asarray([[0.5, 0.0, 0.0]]), n)
    np.testing.assert_allclose(np.asarray(uv), [[0.5, 0.5]], atol=1e-6)
    # north pole: v = 1
    uv = compute_uv(g, jnp.asarray([[0.0, 0.5, 0.0]]), n)
    assert abs(float(uv[0, 1]) - 1.0) < 1e-6
    # south pole: v = 0
    uv = compute_uv(g, jnp.asarray([[0.0, -0.5, 0.0]]), n)
    assert abs(float(uv[0, 1])) < 1e-6


def test_compute_uv_mesh_box_map_uses_normal():
    # mesh lane with a z-facing normal box-maps onto the xy plane even
    # when |p| is dominated by another axis
    uv = compute_uv(
        jnp.asarray([MESH]),
        jnp.asarray([[3.0, 0.25, 0.1]]),
        jnp.asarray([[0.0, 0.0, -1.0]]),
    )
    np.testing.assert_allclose(np.asarray(uv), [[3.5, 0.75]], atol=1e-6)


def _quad_atlas():
    # 2x2 texture with four primary texels
    data = np.zeros((1, 2, 2, 3), np.float32)
    data[0, 0, 0] = (1, 0, 0)
    data[0, 0, 1] = (0, 1, 0)
    data[0, 1, 0] = (0, 0, 1)
    data[0, 1, 1] = (1, 1, 0)
    return TextureAtlas(data=jnp.asarray(data), hw=jnp.asarray([[2.0, 2.0]]))


def test_sample_atlas_texel_centers_wrap_and_bilerp():
    atlas = _quad_atlas()
    tid = jnp.zeros((4,))
    # texel centers: u = (x+.5)/2, v = 1 - (y+.5)/2
    uv = jnp.asarray([[0.25, 0.75], [0.75, 0.75], [0.25, 0.25], [0.75, 0.25]])
    out = np.asarray(sample_atlas(atlas, tid, uv))
    np.testing.assert_allclose(
        out, [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], atol=1e-6
    )
    # untextured lanes (tex_id < 0) return 1 = no modulation
    out = np.asarray(
        sample_atlas(atlas, jnp.asarray([-1.0]), jnp.asarray([[0.25, 0.75]]))
    )
    np.testing.assert_allclose(out, [[1, 1, 1]])
    # wrapping: u+2 lands on the same texel
    out = np.asarray(
        sample_atlas(atlas, jnp.zeros((1,)), jnp.asarray([[2.25, 0.75]]))
    )
    np.testing.assert_allclose(out, [[1, 0, 0]], atol=1e-6)
    # bilinear midpoint between red and green texels
    mid = np.asarray(
        sample_atlas(atlas, jnp.zeros((1,)), jnp.asarray([[0.5, 0.75]]))
    )
    np.testing.assert_allclose(mid, [[0.5, 0.5, 0]], atol=1e-6)


def test_build_atlas_pads_and_records_sizes():
    atlas = build_atlas(
        [np.ones((4, 8, 3), np.float32), np.zeros((6, 2, 3), np.float32)]
    )
    assert atlas.data.shape == (2, 6, 8, 3)
    np.testing.assert_allclose(np.asarray(atlas.hw), [[4, 8], [6, 2]])


def test_parse_texture_dsl():
    from pathtracer_tpu.scene.parser import load_scene

    desc = load_scene(SCENE)
    assert len(desc.texture_images) == 1
    assert desc.texture_images[0].shape == (64, 64, 3)
    m = desc.materials
    assert m["texture_type"][1] == 3.0
    assert m["texture_image"][1] == 0.0
    assert m["texture_image"][0] == -1.0
    assert m["texture_scale"][1] == 1.0
    scene = desc.scene_for_frame(0)
    assert scene.textures is not None and scene.textures.count == 1


def test_textured_render_shows_image_colors():
    """End-to-end: the quadrant PNG's saturated hues must appear in the
    render (without image textures this scene is grayscale — walls, light
    and the textured material's base color are all neutral)."""
    import dataclasses

    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.scene.parser import load_scene

    desc = load_scene(SCENE)
    scene = desc.scene_for_frame(0)
    scene = dataclasses.replace(
        scene,
        camera=dataclasses.replace(scene.camera, resolution=(96, 96)),
    )
    cfg = RenderConfig(max_depth=3, iters_per_launch=8)
    img, _, _ = render(scene, 8, cfg)
    img = np.asarray(img).reshape(-1, 3)
    r, g, b = img[:, 0], img[:, 1], img[:, 2]

    def count(mask):
        return int(np.sum(mask))

    # each quadrant hue must dominate on a meaningful patch of pixels
    assert count((r > 1.5 * g) & (r > 1.5 * b) & (r > 0.15)) > 20, "red quadrant"
    assert count((g > 1.5 * r) & (g > 1.5 * b) & (g > 0.15)) > 20, "green quadrant"
    assert count((b > 1.5 * r) & (b > 1.5 * g) & (b > 0.15)) > 20, "blue quadrant"
    # yellow: r and g high, b low
    assert count((r > 1.5 * b) & (g > 1.5 * b) & (r > 0.15)) > 20, "yellow quadrant"


def test_texel_gradients_flow():
    """The texel table is a differentiable leaf: inverse texture painting.
    d(loss)/d(atlas) must be finite and nonzero on visible texels."""
    import dataclasses

    from pathtracer_tpu.render.diff import (
        l2_loss,
        params_from_description,
    )
    from pathtracer_tpu.scene.parser import load_scene

    desc = load_scene(SCENE)
    desc = dataclasses.replace(desc, resolution=(24, 24))
    params, static = params_from_description(desc)
    assert params.textures is not None
    target = jnp.zeros((24 * 24, 3), jnp.float32)
    cfg = RenderConfig(max_depth=2)
    grads = jax.grad(l2_loss)(
        params, static, target, 2, jax.random.PRNGKey(0), cfg
    )
    gtex = np.asarray(grads.textures.data)
    assert np.isfinite(gtex).all()
    assert np.abs(gtex).max() > 0.0
