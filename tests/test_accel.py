"""Chunked-LBVH mesh acceleration (ops/accel.py — the KD-tree elective):
equality with the dense triangle sweep, padding, root-miss early-out, and
end-to-end scene integration through intersect_scene."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops.accel import build_mesh_accel, mesh_t_and_normal_accel
from pathtracer_tpu.ops.intersect import mesh_t_and_normal
from pathtracer_tpu.scene.obj import make_icosphere


def _rays(n, seed=0, spread=2.0):
    o = np.asarray(jax.random.normal(jax.random.PRNGKey(seed), (n, 3))) * spread
    d = np.asarray(jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3)))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _norm(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True).clip(1e-12)


def test_accel_matches_dense_sweep():
    tris = make_icosphere(2)  # 320 tris: not a multiple of 128 -> padding
    accel = build_mesh_accel(tris)
    assert accel.n_tris == 320
    assert accel.chunks.shape == (3, 128, 3, 3)
    o, d = _rays(512)
    t_ref, n_ref = jax.jit(mesh_t_and_normal)(o, d, jnp.asarray(tris))
    t_acc, n_acc = jax.jit(mesh_t_and_normal_accel)(o, d, accel)
    t_ref, n_ref = np.asarray(t_ref), np.asarray(n_ref)
    t_acc, n_acc = np.asarray(t_acc), np.asarray(n_acc)
    hit = t_ref < 1e29
    np.testing.assert_array_equal(hit, t_acc < 1e29)
    np.testing.assert_allclose(t_ref[hit], t_acc[hit], rtol=1e-6, atol=1e-6)
    # face normals (unnormalized from both paths) must agree in direction
    np.testing.assert_allclose(
        _norm(n_ref[hit]), _norm(n_acc[hit]), rtol=1e-5, atol=1e-5
    )


def test_accel_root_miss_early_out():
    tris = make_icosphere(1)
    accel = build_mesh_accel(tris)
    # rays far away pointing outward: root AABB test must report all-miss
    o = jnp.full((64, 3), 10.0)
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (64, 1))
    t, _ = jax.jit(mesh_t_and_normal_accel)(o, d, accel)
    assert np.all(np.asarray(t) > 1e29)


def test_accel_in_scene_intersect():
    """A high-res mesh icosphere instance inside intersect_scene gives the
    same hits as the dense-path instance (accel=None)."""
    import dataclasses

    from pathtracer_tpu.ops.intersect import intersect_scene
    from pathtracer_tpu.ops.transforms import build_transform
    from pathtracer_tpu.scene.structs import MESH, Geoms, MeshInstance, Rays

    tris = make_icosphere(2)
    t4, inv4 = build_transform(
        np.array([[0.0, 0.5, 0.0]], np.float32),
        np.array([[0.0, 30.0, 0.0]], np.float32),
        np.array([[1.5, 1.0, 1.0]], np.float32),
    )
    geoms = Geoms(
        type=jnp.asarray([MESH], jnp.int32),
        material_id=jnp.asarray([0], jnp.int32),
        transform=t4,
        inv_transform=inv4,
    )
    o, d = _rays(256, seed=5, spread=3.0)
    rays = Rays(origin=o, direction=d)
    mesh_dense = MeshInstance(geom_index=0, tri_verts=jnp.asarray(tris), accel=None)
    mesh_accel = dataclasses.replace(mesh_dense, accel=build_mesh_accel(tris))
    h0 = jax.jit(lambda r: intersect_scene(r, geoms, (mesh_dense,)))(rays)
    h1 = jax.jit(lambda r: intersect_scene(r, geoms, (mesh_accel,)))(rays)
    np.testing.assert_array_equal(np.asarray(h0.hit), np.asarray(h1.hit))
    m = np.asarray(h0.hit)
    np.testing.assert_allclose(
        np.asarray(h0.t)[m], np.asarray(h1.t)[m], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(h0.normal)[m], np.asarray(h1.normal)[m], rtol=1e-5, atol=1e-5
    )


def test_scene_for_frame_builds_accel_above_threshold():
    """SceneDescription attaches an accel only for meshes >= the triangle
    threshold (structs.ACCEL_MIN_TRIS)."""
    import dataclasses as dc
    import os

    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "mesh_demo.txt")
    desc = load_scene(path)
    small = desc.scene_for_frame(0)
    # ico.obj is tiny -> no accel
    assert all(m.accel is None for m in small.meshes)

    big_tris = make_icosphere(2)  # 320 >= 256
    desc2 = dc.replace(
        desc,
        mesh_tris=tuple(
            big_tris if t is not None else None for t in desc.mesh_tris
        ),
    )
    big = desc2.scene_for_frame(0)
    assert any(m.accel is not None for m in big.meshes)
