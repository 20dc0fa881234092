"""Displacement mapping + deformational motion blur (the two hard
electives, reference README.md:63-66)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.scene.displace import displace_mesh, subdivide, vertex_normals
from pathtracer_tpu.scene.parser import load_scene

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


# ---------------------------------------------------------------------------
# displacement mapping
# ---------------------------------------------------------------------------

def _ico_tris():
    from pathtracer_tpu.scene.obj import load_obj

    return load_obj(os.path.join(SCENES, "assets", "ico.obj"))


def test_subdivision_is_pure_refinement():
    """amount=0: subdivision alone never changes any intersection —
    the 4-way midpoint split tiles each base triangle exactly."""
    from pathtracer_tpu.ops.intersect import mesh_t_and_normal

    tris = _ico_tris()
    fine = subdivide(tris, 2)
    assert fine.shape == (tris.shape[0] * 16, 3, 3)

    o = np.random.RandomState(0).normal(size=(256, 3)).astype(np.float32) * 2.0
    d = np.random.RandomState(1).normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t0, _ = mesh_t_and_normal(jnp.asarray(o), jnp.asarray(d), jnp.asarray(tris))
    t1, _ = mesh_t_and_normal(jnp.asarray(o), jnp.asarray(d), jnp.asarray(fine))
    hit = np.asarray(t0) < 1e29
    np.testing.assert_allclose(
        np.asarray(t0)[hit], np.asarray(t1)[hit], rtol=1e-4, atol=1e-4
    )


def test_vertex_normals_point_outward_and_are_shared():
    tris = _ico_tris()
    n = vertex_normals(tris)
    # icosahedron is centered: vertex normals point away from the origin
    dots = np.sum(n * tris / np.linalg.norm(tris, axis=-1, keepdims=True), axis=-1)
    assert (dots > 0.5).all()
    # coincident corners got identical normals (watertight displacement)
    flat_p = np.round(tris.reshape(-1, 3), 5)
    flat_n = n.reshape(-1, 3)
    _, inv = np.unique(flat_p, axis=0, return_inverse=True)
    for u in range(inv.max() + 1):
        grp = flat_n[inv == u]
        np.testing.assert_allclose(grp, np.broadcast_to(grp[0], grp.shape), atol=1e-6)


def test_displacement_moves_surface_but_preserves_topology():
    tris = _ico_tris()
    disp = displace_mesh(tris, amount=0.06, levels=2, mode="sin", arg=9.0)
    base = subdivide(tris, 2)
    assert disp.shape == base.shape
    delta = np.linalg.norm(disp - base, axis=-1)
    assert delta.max() > 0.01  # actually displaced
    assert delta.max() <= 0.06 + 1e-6  # bounded by amount
    # watertight: shared corners still coincide after displacement
    flat = np.round(disp.reshape(-1, 3), 5)
    flat_base = np.round(base.reshape(-1, 3), 5)
    _, inv = np.unique(flat_base, axis=0, return_inverse=True)
    for u in range(0, inv.max() + 1, 7):  # sample every 7th shared vertex
        grp = disp.reshape(-1, 3)[inv == u]
        np.testing.assert_allclose(grp, np.broadcast_to(grp[0], grp.shape), atol=1e-4)


def test_displace_scene_parses_and_renders():
    import dataclasses

    from pathtracer_tpu.render.integrator import render

    desc = load_scene(os.path.join(SCENES, "displace_demo.txt"))
    assert desc.mesh_tris[1].shape[0] == 20 * 4**3  # 3 subdivision levels
    desc = dataclasses.replace(desc, resolution=(48, 48))
    scene = desc.scene_for_frame(0)
    img, _, _ = render(scene, 2, RenderConfig(max_depth=3, iters_per_launch=2))
    assert np.isfinite(np.asarray(img)).all()
    assert float(jnp.mean(img)) > 0.01


# ---------------------------------------------------------------------------
# deformational animation / motion blur
# ---------------------------------------------------------------------------

def test_deform_scene_per_frame_vertices():
    desc = load_scene(os.path.join(SCENES, "deform_demo.txt"))
    v0 = desc.mesh_tris_for_frame(0)[1]
    v1 = desc.mesh_tris_for_frame(1)[1]
    assert v0.shape == v1.shape
    assert np.abs(v0 - v1).max() > 0.1  # frames genuinely deform
    # squash is y*0.6, xz*1.25 of the base mesh
    np.testing.assert_allclose(v1[..., 1], v0[..., 1] * 0.6, atol=1e-5)
    np.testing.assert_allclose(v1[..., 0], v0[..., 0] * 1.25, atol=1e-5)

    s0 = desc.scene_for_frame(0)
    s1 = desc.scene_for_frame(1)
    assert np.abs(
        np.asarray(s0.meshes[0].tri_verts) - np.asarray(s1.meshes[0].tri_verts)
    ).max() > 0.1


def test_deform_params_lerp_is_deformational():
    """params_from_description picks per-frame vertices and lerp_params
    produces the halfway shape — the substrate of deformational blur."""
    from pathtracer_tpu.render.diff import params_from_description
    from pathtracer_tpu.render.motion import lerp_params

    desc = load_scene(os.path.join(SCENES, "deform_demo.txt"))
    p0, _ = params_from_description(desc, 0)
    p1, _ = params_from_description(desc, 1)
    mid = lerp_params(p0, p1, 0.5)
    want = 0.5 * (np.asarray(p0.mesh_verts[0]) + np.asarray(p1.mesh_verts[0]))
    np.testing.assert_allclose(np.asarray(mid.mesh_verts[0]), want, rtol=1e-6)
    assert np.abs(np.asarray(p0.mesh_verts[0]) - np.asarray(p1.mesh_verts[0])).max() > 0.1


@pytest.mark.slow
def test_deformational_motion_blur_renders():
    """render_motion over the deforming interval executes and lands
    between the two static frames in overall brightness."""
    import dataclasses

    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.render.motion import render_motion

    desc = load_scene(os.path.join(SCENES, "deform_demo.txt"))
    desc = dataclasses.replace(desc, resolution=(32, 32))
    cfg = RenderConfig(max_depth=3, wavefront=False, iters_per_launch=4)
    img_b, _, _ = render_motion(desc, 0, 8, cfg)
    assert np.isfinite(np.asarray(img_b)).all()
    m0 = float(jnp.mean(render(desc.scene_for_frame(0), 8, cfg)[0]))
    m1 = float(jnp.mean(render(desc.scene_for_frame(1), 8, cfg)[0]))
    mb = float(jnp.mean(img_b))
    lo, hi = min(m0, m1), max(m0, m1)
    assert lo - 0.02 <= mb <= hi + 0.02
