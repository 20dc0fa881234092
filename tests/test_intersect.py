"""Closed-form intersection cases (SURVEY.md §4.1): axis rays at unit
sphere/cube, transformed instances, miss/graze, inside-out, world-distance
semantics of the inverse-transform test (reference intersections.h:78-204)."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops.intersect import (
    BIG,
    cube_normal_obj,
    cube_t,
    intersect_scene,
    intersect_t_sweep,
    sphere_t,
)
from pathtracer_tpu.ops.transforms import build_transform
from pathtracer_tpu.scene.structs import CUBE, SPHERE, Geoms, Rays


def _geoms(specs):
    """specs: list of (type, translate, rotate, scale)."""
    types = np.array([s[0] for s in specs], np.int32)
    t, inv = build_transform(
        np.array([s[1] for s in specs], np.float32),
        np.array([s[2] for s in specs], np.float32),
        np.array([s[3] for s in specs], np.float32),
    )
    return Geoms(
        type=jnp.asarray(types),
        material_id=jnp.zeros(len(specs), jnp.int32),
        transform=t,
        inv_transform=inv,
    )


def _rays(os_, ds_):
    ds = np.array(ds_, np.float32)
    ds = ds / np.linalg.norm(ds, axis=-1, keepdims=True)
    return Rays(origin=jnp.asarray(np.array(os_, np.float32)), direction=jnp.asarray(ds))


def test_sphere_axis_hits():
    o = jnp.array([[0.0, 0.0, 2.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = sphere_t(o, d)
    np.testing.assert_allclose(np.asarray(t), [1.5], atol=1e-6)  # r=0.5

    # from inside: exits at 0.5
    t_in = sphere_t(jnp.zeros((1, 3)), d)
    np.testing.assert_allclose(np.asarray(t_in), [0.5], atol=1e-6)

    # miss
    t_miss = sphere_t(jnp.array([[0.0, 1.0, 2.0]]), d)
    assert float(t_miss[0]) >= BIG


def test_cube_axis_hits():
    o = jnp.array([[0.0, 0.0, 2.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    np.testing.assert_allclose(np.asarray(cube_t(o, d)), [1.5], atol=1e-6)
    # inside the cube: exit face at 0.5
    np.testing.assert_allclose(np.asarray(cube_t(jnp.zeros((1, 3)), d)), [0.5], atol=1e-6)
    # parallel to a slab, offset outside -> miss
    t_miss = cube_t(jnp.array([[0.0, 0.7, 2.0]]), d)
    assert float(t_miss[0]) >= BIG


def test_cube_face_normals():
    for axis in range(3):
        for sign in (-1.0, 1.0):
            p = np.zeros(3, np.float32)
            p[axis] = 0.5 * sign
            p[(axis + 1) % 3] = 0.19  # off-center on the face
            n = np.asarray(cube_normal_obj(jnp.asarray(p)))
            expected = np.zeros(3)
            expected[axis] = sign
            np.testing.assert_allclose(n, expected, atol=1e-6)


def test_transformed_instance_world_distance():
    # sphere scaled 3x at (0, 2, 0); camera-style ray from (0, 2, 10) -> -z
    geoms = _geoms([(SPHERE, [0, 2, 0], [0, 0, 0], [3, 3, 3])])
    rays = _rays([[0, 2, 10]], [[0, 0, -1]])
    hit = jax.jit(intersect_scene)(rays, geoms)
    # world radius = 1.5 => distance 8.5, world-space (the reference returns
    # glm::length(origin - realIntersectionPoint), intersections.h:201)
    np.testing.assert_allclose(np.asarray(hit.t), [8.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.normal), [[0, 0, 1]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.position), [[0, 2, 1.5]], atol=1e-4)


def test_rotated_thin_wall():
    # cornell wall: cube scaled (.01,10,10) rotated 90 about z => thin in y
    geoms = _geoms([(CUBE, [0, 0, 0], [0, 0, 90], [0.01, 10, 10])])
    rays = _rays([[0, 5, 0]], [[0, -1, 0]])
    hit = jax.jit(intersect_scene)(rays, geoms)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 4.995, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hit.normal), [[0, 1, 0]], atol=1e-4)


def test_nearest_hit_selection():
    geoms = _geoms(
        [
            (SPHERE, [0, 0, -5], [0, 0, 0], [1, 1, 1]),
            (SPHERE, [0, 0, -2], [0, 0, 0], [1, 1, 1]),  # nearer
            (CUBE, [0, 0, -9], [0, 0, 0], [4, 4, 4]),
        ]
    )
    rays = _rays([[0, 0, 0]], [[0, 0, -1]])
    hit = jax.jit(intersect_scene)(rays, geoms)
    assert int(hit.geom_id[0]) == 1
    np.testing.assert_allclose(float(hit.t[0]), 1.5, atol=1e-5)


def test_sweep_shape_and_miss():
    geoms = _geoms([(SPHERE, [0, 0, -5], [0, 0, 0], [1, 1, 1])] * 4)
    rays = _rays([[0, 0, 0], [0, 10, 0]], [[0, 0, -1], [0, 0, -1]])
    t = intersect_t_sweep(rays, geoms)
    assert t.shape == (2, 4)
    assert np.all(np.asarray(t[1]) >= BIG)  # second ray misses everything
    hit = intersect_scene(rays, geoms)
    assert not bool(hit.hit[1])


def test_grazing_and_t_min_bias():
    # origin exactly on the sphere surface pointing away: no self-hit
    geoms = _geoms([(SPHERE, [0, 0, 0], [0, 0, 0], [1, 1, 1])])
    rays = _rays([[0, 0, 0.5]], [[0, 0, 1]])
    hit = jax.jit(intersect_scene)(rays, geoms)
    assert not bool(hit.hit[0])


def test_gradient_through_intersection():
    # d t / d translation_z for a head-on sphere hit is -1 (moving the
    # sphere toward the camera shortens the hit distance)
    def t_of_z(z):
        tr, inv = build_transform(
            jnp.array([0.0, 0.0, z]), jnp.zeros(3), jnp.ones(3)
        )
        geoms = Geoms(
            type=jnp.array([SPHERE], jnp.int32),
            material_id=jnp.zeros(1, jnp.int32),
            transform=tr[None],
            inv_transform=inv[None],
        )
        rays = _rays([[0, 0, 5]], [[0, 0, -1]])
        return intersect_scene(rays, geoms).t[0]

    g = jax.grad(t_of_z)(jnp.float32(0.0))
    np.testing.assert_allclose(float(g), -1.0, atol=1e-4)
