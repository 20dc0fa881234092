"""Authored OBJ attributes: vt (texture coordinates) + vn (smooth
normals), barycentrically interpolated at mesh hits — the reference's
mesh + texture electives together (README.md:57-58).  Covers the loader,
both intersectors (XLA sweep + accel), UV precedence over box mapping,
and the fused-kernel decline."""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops.intersect import intersect_scene
from pathtracer_tpu.ops.transforms import build_transform
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.obj import load_obj_full, make_icosphere
from pathtracer_tpu.scene.parser import load_scene
from pathtracer_tpu.scene.structs import MESH, Geoms, MeshInstance, Rays


def _identity_mesh_geom():
    tr, inv = build_transform(
        np.zeros((1, 3), np.float32),
        np.zeros((1, 3), np.float32),
        np.ones((1, 3), np.float32),
    )
    return Geoms(
        type=jnp.array([MESH], jnp.int32),
        material_id=jnp.zeros(1, jnp.int32),
        transform=tr,
        inv_transform=inv,
    )


def test_load_obj_full_vt_vn(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"
    )
    md = load_obj_full(str(p))
    assert md.verts.shape == (2, 3, 3)
    assert md.uv.shape == (2, 3, 2)
    assert md.norm.shape == (2, 3, 3)
    np.testing.assert_allclose(md.uv[0], [[0, 0], [1, 0], [1, 1]])
    np.testing.assert_allclose(md.norm[1], [[0, 0, 1]] * 3)
    # partial attribution is dropped, not invented
    p2 = tmp_path / "partial.obj"
    p2.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvn 0 0 1\n"
        "f 1/1/1 2//1 3/1\n"
    )
    md2 = load_obj_full(str(p2))
    assert md2.uv is None and md2.norm is None
    assert md2.verts.shape == (1, 3, 3)


def _one_tri_instance(tri_norm=None, tri_uv=None):
    tri = jnp.asarray([[[-1, -1, -3], [1, -1, -3], [0, 1, -3]]], jnp.float32)
    return MeshInstance(
        geom_index=0,
        tri_verts=tri,
        tri_norm=None if tri_norm is None else jnp.asarray(tri_norm, jnp.float32),
        tri_uv=None if tri_uv is None else jnp.asarray(tri_uv, jnp.float32),
    )


def test_smooth_normal_and_uv_interpolation():
    """A ray hitting the triangle at barycentrics (w0, u, v) = (.2, .3, .5)
    gets the normalized interpolation of the corner normals and the exact
    interpolation of the corner UVs."""
    geoms = _identity_mesh_geom()
    mesh = _one_tri_instance(
        tri_norm=[[[1, 0, 0], [0, 1, 0], [0, 0, 1]]],
        tri_uv=[[[0, 0], [1, 0], [0, 1]]],
    )
    # hit point = .2*v0 + .3*v1 + .5*v2 = (0.1, 0.0, -3)
    rays = Rays(
        origin=jnp.array([[0.1, 0.0, 0.0]]),
        direction=jnp.array([[0.0, 0.0, -1.0]]),
    )
    h = jax.jit(lambda r: intersect_scene(r, geoms, (mesh,)))(rays)
    assert bool(h.hit[0])
    expected_n = np.array([0.2, 0.3, 0.5])
    expected_n /= np.linalg.norm(expected_n)
    np.testing.assert_allclose(np.asarray(h.normal[0]), expected_n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.uv[0]), [0.3, 0.5], atol=1e-5)
    assert bool(h.uv_valid[0])


def test_flat_mesh_has_no_uv_fields():
    geoms = _identity_mesh_geom()
    mesh = _one_tri_instance()
    rays = Rays(
        origin=jnp.array([[0.1, 0.0, 0.0]]),
        direction=jnp.array([[0.0, 0.0, -1.0]]),
    )
    h = intersect_scene(rays, geoms, (mesh,))
    assert h.uv is None and h.uv_valid is None


def _sphere_attr_mesh(subdiv=2, accel=False):
    """Icosphere whose authored normals are the EXACT sphere normals
    (vertex direction) — lets the test compare smooth shading against
    analytic ground truth."""
    tris = make_icosphere(subdiv)  # [T,3,3], radius .5
    norms = tris / np.linalg.norm(tris, axis=-1, keepdims=True)
    acc = None
    if accel:
        from pathtracer_tpu.ops.accel import build_mesh_accel

        acc = build_mesh_accel(tris)
    return MeshInstance(
        geom_index=0,
        tri_verts=jnp.asarray(tris),
        accel=acc,
        tri_norm=jnp.asarray(norms, jnp.float32),
        tri_uv=jnp.asarray(norms[..., :2], jnp.float32),  # any smooth field
    )


def _sphere_rays(n=512):
    d = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (n, 3)), np.float64
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -3.0 * d  # all rays aim at the origin through the sphere
    return Rays(origin=jnp.asarray(o, jnp.float32), direction=jnp.asarray(d, jnp.float32))


def test_smooth_normals_beat_facets_and_match_analytic():
    geoms = _identity_mesh_geom()
    rays = _sphere_rays()
    mesh_flat = MeshInstance(
        geom_index=0, tri_verts=_sphere_attr_mesh().tri_verts
    )
    mesh_smooth = _sphere_attr_mesh()
    h_flat = jax.jit(lambda r: intersect_scene(r, geoms, (mesh_flat,)))(rays)
    h_sm = jax.jit(lambda r: intersect_scene(r, geoms, (mesh_smooth,)))(rays)
    m = np.asarray(h_sm.hit)
    assert m.sum() > 400
    exact = np.asarray(h_sm.position)[m]
    exact = exact / np.linalg.norm(exact, axis=-1, keepdims=True)
    err_sm = np.abs(1.0 - np.abs((np.asarray(h_sm.normal)[m] * exact).sum(-1)))
    err_flat = np.abs(1.0 - np.abs((np.asarray(h_flat.normal)[m] * exact).sum(-1)))
    # smooth normals track the analytic sphere far better than facets
    assert err_sm.mean() < 0.1 * err_flat.mean()
    assert err_sm.max() < 2e-3


def test_accel_and_dense_attr_paths_agree():
    """Morton-reordered (accel) winners must map back to the same
    file-order attributes as the dense sweep."""
    geoms = _identity_mesh_geom()
    rays = _sphere_rays()
    h_dense = jax.jit(
        lambda r: intersect_scene(r, geoms, (_sphere_attr_mesh(accel=False),))
    )(rays)
    h_accel = jax.jit(
        lambda r: intersect_scene(r, geoms, (_sphere_attr_mesh(accel=True),))
    )(rays)
    np.testing.assert_array_equal(np.asarray(h_dense.hit), np.asarray(h_accel.hit))
    m = np.asarray(h_dense.hit)
    np.testing.assert_allclose(
        np.asarray(h_dense.normal)[m], np.asarray(h_accel.normal)[m], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_dense.uv)[m], np.asarray(h_accel.uv)[m], atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(h_dense.uv_valid), np.asarray(h_accel.uv_valid)
    )


SCENE = """
MATERIAL 0
RGB 1 1 1
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0
TEXTURE {tex} 1

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
RES 32 32
FOVY 30
ITERATIONS 4
FILE out.png
frame 0
EYE 0 0 4
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
{obj}
material 0
frame 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 2 2 2

OBJECT 1
cube
material 1
frame 0
TRANS 0 0 6
ROTAT 0 0 0
SCALE 6 6 .2
"""


def test_scene_dsl_authored_uv_changes_texture(tmp_path):
    """End to end through the DSL: the same textured quad renders
    differently with authored vt (rotated UVs) than with box mapping,
    and the auto engine declines the fused kernel loudly."""
    from pathtracer_tpu.utils.imageio import save_image

    # texture with strongly distinct quadrants
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:4, :, 0] = 1.0  # top half red
    tex[4:, :, 2] = 1.0  # bottom half blue
    save_image(str(tmp_path / "t.png"), tex)

    quad = (
        "v -0.5 -0.5 0\nv 0.5 -0.5 0\nv 0.5 0.5 0\nv -0.5 0.5 0\n"
        "{vt}"
        "f {f1} {f2} {f3} {f4}\n"
    )
    # authored: UVs ROTATED 90 deg vs the natural box map
    (tmp_path / "quad_vt.obj").write_text(
        quad.format(
            vt="vt 0 1\nvt 0 0\nvt 1 0\nvt 1 1\n",
            f1="1/1", f2="2/2", f3="3/3", f4="4/4",
        )
    )
    (tmp_path / "quad_plain.obj").write_text(
        quad.format(vt="", f1="1", f2="2", f3="3", f4="4")
    )

    def run(obj_name):
        scene_file = tmp_path / f"s_{obj_name}.txt"
        scene_file.write_text(SCENE.format(tex="t.png", obj=obj_name))
        desc = load_scene(str(scene_file))
        sc = desc.scene_for_frame(0)
        cfg = RenderConfig(max_depth=2, iters_per_launch=4, jitter=False)
        _, accum, _ = render(sc, 4, cfg)
        return sc, np.asarray(accum).reshape(32, 32, 3) / 4.0

    sc_vt, img_vt = run("quad_vt.obj")
    _, img_plain = run("quad_plain.obj")
    assert sc_vt.meshes[0].tri_uv is not None
    assert np.isfinite(img_vt).all()
    # the rotated authored UVs swap the red/blue halves vs box mapping
    assert np.abs(img_vt - img_plain).max() > 0.1


def test_fused_runs_attributed_mesh_with_smooth_normals(tmp_path):
    """r4: cfg.fused=True on an attributed-mesh scene runs the mesh-merge
    kernel WITH the authored smooth normals (they ride the merge planes)
    — the render equals the split path instead of falling back."""
    import numpy as np

    (tmp_path / "tri.obj").write_text(
        "v -0.5 -0.5 0\nv 0.5 -0.5 0\nv 0 0.5 0\n"
        "vn 0 0.2 1\nvn 0.2 0 1\nvn -0.2 0 1\n"
        "f 1//1 2//2 3//3\n"
    )
    scene_file = tmp_path / "s.txt"
    scene_file.write_text(
        SCENE.format(tex="checker", obj="tri.obj").replace(
            "TEXTURE checker 1\n", ""
        )
    )
    desc = load_scene(str(scene_file))
    sc = desc.scene_for_frame(0)
    assert sc.meshes[0].tri_norm is not None
    cfg = RenderConfig(max_depth=2, iters_per_launch=2)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)  # no decline warning
        _, acc_fused, _ = render(
            sc, 2, dataclasses.replace(cfg, fused=True)
        )
    _, acc_split, _ = render(
        sc, 2, dataclasses.replace(cfg, fused=False, pallas=False)
    )
    np.testing.assert_allclose(
        np.asarray(acc_fused), np.asarray(acc_split), rtol=5e-4, atol=5e-4
    )


@pytest.mark.slow
def test_fused_image_texture_with_authored_uv_matches_split(tmp_path):
    """r4: an attributed mesh under an IMAGE texture runs the fused
    kernel with the authored vt riding the merge planes and the texel
    deferred to the wrapper — accumulator equal to the split path, and
    genuinely using the authored UVs (differs from the box-mapped
    variant)."""
    from pathtracer_tpu.utils.imageio import save_image

    tex = np.zeros((8, 8, 3), np.float32)
    tex[:4, :, 0] = 1.0
    tex[4:, :, 2] = 1.0
    save_image(str(tmp_path / "t.png"), tex)
    quad = (
        "v -0.5 -0.5 0\nv 0.5 -0.5 0\nv 0.5 0.5 0\nv -0.5 0.5 0\n"
        "{vt}"
        "f {f1} {f2} {f3} {f4}\n"
    )
    (tmp_path / "quad_vt.obj").write_text(
        quad.format(
            vt="vt 0 1\nvt 0 0\nvt 1 0\nvt 1 1\n",
            f1="1/1", f2="2/2", f3="3/3", f4="4/4",
        )
    )
    (tmp_path / "quad_plain.obj").write_text(
        quad.format(vt="", f1="1", f2="2", f3="3", f4="4")
    )

    def run(obj_name, fused):
        scene_file = tmp_path / f"s_{obj_name}_{fused}.txt"
        scene_file.write_text(SCENE.format(tex="t.png", obj=obj_name))
        desc = load_scene(str(scene_file))
        sc = desc.scene_for_frame(0)
        cfg = RenderConfig(
            max_depth=2, iters_per_launch=2, jitter=False,
            fused=fused, pallas=fused,
        )
        _, accum, _ = render(sc, 2, cfg)
        return np.asarray(accum)

    a_split = run("quad_vt.obj", False)
    a_fused = run("quad_vt.obj", True)
    np.testing.assert_allclose(a_fused, a_split, rtol=6e-4, atol=1e-4)
    a_plain = run("quad_plain.obj", True)
    assert np.abs(a_fused - a_plain).max() > 0.05
