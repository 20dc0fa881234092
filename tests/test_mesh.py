"""Triangle mesh (OBJ) support: loader, Moeller-Trumbore sweep, and the
acid test — a cube OBJ mesh renders identically to the analytic cube."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops.intersect import intersect_scene, mesh_t_and_normal
from pathtracer_tpu.ops.transforms import build_transform
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.obj import load_obj, make_cube_obj
from pathtracer_tpu.scene.parser import parse_scene_text
from pathtracer_tpu.scene.structs import CUBE, MESH, Geoms, MeshInstance, Rays


def test_obj_loader(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("# comment\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2/1 4/2/3 3//1\n")
    tris = load_obj(str(p))
    assert tris.shape == (2, 3, 3)
    np.testing.assert_allclose(tris[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_obj_loader_fan_and_negative(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    tris = load_obj(str(p))
    assert tris.shape == (2, 3, 3)  # quad -> 2 triangles


def test_single_triangle_hit():
    tri = jnp.asarray([[[-1, -1, -3], [1, -1, -3], [0, 1, -3]]], jnp.float32)
    o = jnp.array([[0.0, 0.0, 0.0], [5.0, 5.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, n = mesh_t_and_normal(o, d, tri)
    assert float(t[0]) == pytest.approx(3.0, abs=1e-5)
    assert float(t[1]) > 1e29  # miss
    n0 = np.asarray(n[0])
    n0 = n0 / np.linalg.norm(n0)
    np.testing.assert_allclose(np.abs(n0), [0, 0, 1], atol=1e-6)


def test_chunk_padding_many_triangles():
    # 131 triangles (not a multiple of 128) stacked along z; nearest wins
    z = -(np.arange(131, dtype=np.float32) + 1.0)
    tris = np.stack(
        [
            np.stack([np.full(131, -1.0), np.full(131, -1.0), z], -1),
            np.stack([np.full(131, 1.0), np.full(131, -1.0), z], -1),
            np.stack([np.full(131, 0.0), np.full(131, 1.0), z], -1),
        ],
        axis=1,
    )
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, _ = mesh_t_and_normal(o, d, jnp.asarray(tris))
    assert float(t[0]) == pytest.approx(1.0, abs=1e-5)


def test_mesh_cube_matches_analytic_cube():
    """intersect_scene with a cube OBJ == analytic CUBE primitive."""
    tris = load_obj_text(make_cube_obj())
    tr, inv = build_transform(
        np.array([[0.5, -0.25, -4.0]], np.float32),
        np.array([[10.0, 20.0, 30.0]], np.float32),
        np.array([[2.0, 1.5, 1.0]], np.float32),
    )
    base = dict(material_id=jnp.zeros(1, jnp.int32), transform=tr, inv_transform=inv)
    g_cube = Geoms(type=jnp.array([CUBE], jnp.int32), **base)
    g_mesh = Geoms(type=jnp.array([MESH], jnp.int32), **base)
    mesh = MeshInstance(geom_index=0, tri_verts=jnp.asarray(tris))

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (512, 3), minval=-1, maxval=1) + jnp.array([0, 0, 2.0])
    d = jax.random.normal(jax.random.PRNGKey(1), (512, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(origin=o, direction=d)

    h_cube = jax.jit(lambda r: intersect_scene(r, g_cube))(rays)
    h_mesh = jax.jit(lambda r: intersect_scene(r, g_mesh, (mesh,)))(rays)
    np.testing.assert_array_equal(np.asarray(h_cube.hit), np.asarray(h_mesh.hit))
    m = np.asarray(h_cube.hit)
    np.testing.assert_allclose(
        np.asarray(h_cube.t)[m], np.asarray(h_mesh.t)[m], rtol=1e-4, atol=1e-4
    )
    # face normals agree up to sign (mesh winding is two-sided)
    nc = np.asarray(h_cube.normal)[m]
    nm = np.asarray(h_mesh.normal)[m]
    dot = np.abs((nc * nm).sum(-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def load_obj_text(text):
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write(text)
        name = f.name
    return load_obj(name)


def test_mesh_scene_end_to_end(tmp_path):
    """Full render of a scene whose only object besides light/floor is an
    OBJ mesh, via the DSL *.obj object type."""
    objp = tmp_path / "box.obj"
    objp.write_text(make_cube_obj())
    txt = f"""
MATERIAL 0
RGB .7 .7 .7
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 1
RGB 1 1 1
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 6

CAMERA
RES 24 24
FOVY 35
ITERATIONS 1
FILE x.png
frame 0
EYE 0 2 8
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
cube
material 0
frame 0
TRANS 0 -1 0
ROTAT 0 0 0
SCALE 30 1 30

OBJECT 1
{objp}
material 0
frame 0
TRANS 0 1.5 0
ROTAT 0 40 0
SCALE 2.5 2.5 2.5

OBJECT 2
cube
material 1
frame 0
TRANS 0 9 0
ROTAT 0 0 0
SCALE 10 .3 10
"""
    desc = parse_scene_text(txt, scene_dir=str(tmp_path))
    assert desc.geom_type[1] == MESH
    sc = desc.scene_for_frame(0)
    assert len(sc.meshes) == 1 and sc.meshes[0].geom_index == 1
    img, accum, _ = render(sc, 16, RenderConfig(max_depth=4, iters_per_launch=16))
    a = np.asarray(accum).reshape(24, 24, 3) / 16.0
    # the mesh cube is visible in the center and lit
    assert a[12, 12].sum() > 0.1
    # and it shadows the floor beneath relative to open floor
    assert a.sum() > 0
