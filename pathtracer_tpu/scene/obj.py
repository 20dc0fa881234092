"""Wavefront OBJ mesh loading.

Realizes the reference's declared-but-empty mesh path: ``GEOMTYPE::MESH``
exists (sceneStructs.h:14), the scene loader accepts ``*.obj`` object
types (scene.cpp:63-66), and the trace kernel's MESH branch is an empty
TODO (raytraceKernel.cu:144-145).  Supported OBJ subset: ``v`` positions
and ``f`` faces (any arity, fan-triangulated; ``v/vt/vn`` index syntax
accepted, only the position index is used; negative indices supported).
"""

from __future__ import annotations

import os

import numpy as np


def load_obj(path: str) -> np.ndarray:
    """Load an OBJ file -> expanded triangle vertices ``[T, 3, 3]`` float32
    (mesh object space)."""
    verts = []
    tris = []
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "v" and len(parts) >= 4:
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "f" and len(parts) >= 4:
                idx = []
                for tok in parts[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tris.append((idx[0], idx[k], idx[k + 1]))
    if not tris:
        raise ValueError(f"{path}: OBJ has no faces")
    v = np.asarray(verts, np.float32)
    t = np.asarray(tris, np.int64)
    if t.min() < 0 or t.max() >= len(v):
        raise ValueError(f"{path}: face index out of range")
    return v[t]  # [T, 3, 3]


def load_mesh_for_scene(scene_path: str, mesh_token: str) -> np.ndarray:
    """Resolve a mesh path from the scene DSL (relative to the scene file,
    falling back to cwd) and load it."""
    candidates = [
        mesh_token,
        os.path.join(os.path.dirname(os.path.abspath(scene_path)), mesh_token),
    ]
    for c in candidates:
        if os.path.exists(c):
            return load_obj(c)
    raise FileNotFoundError(f"mesh {mesh_token!r} (tried {candidates})")


def make_cube_obj() -> str:
    """A unit cube (side 1, centered) as OBJ text — used by tests to check
    mesh rendering against the analytic cube primitive."""
    v = []
    for z in (-0.5, 0.5):
        for y in (-0.5, 0.5):
            for x in (-0.5, 0.5):
                v.append((x, y, z))
    # 12 triangles, outward-facing (winding irrelevant: two-sided shading)
    faces = [
        (1, 2, 4), (1, 4, 3),  # z = -0.5
        (5, 8, 6), (5, 7, 8),  # z = +0.5
        (1, 5, 6), (1, 6, 2),  # y = -0.5
        (3, 4, 8), (3, 8, 7),  # y = +0.5
        (1, 3, 7), (1, 7, 5),  # x = -0.5
        (2, 6, 8), (2, 8, 4),  # x = +0.5
    ]
    lines = [f"v {x} {y} {z}" for (x, y, z) in v]
    lines += [f"f {a} {b} {c}" for (a, b, c) in faces]
    return "\n".join(lines) + "\n"


def make_icosphere(subdiv: int = 2, radius: float = 0.5):
    """Subdivided icosahedron as ``[T, 3, 3]`` float32 triangles (object
    space, radius 0.5 like the unit sphere primitive).  ``subdiv`` n gives
    20 * 4^n triangles — used to exercise the mesh path and the chunked
    LBVH (ops/accel.py) at realistic triangle counts."""
    phi = (1.0 + 5.0**0.5) / 2.0
    verts = np.array(
        [
            (-1, phi, 0), (1, phi, 0), (-1, -phi, 0), (1, -phi, 0),
            (0, -1, phi), (0, 1, phi), (0, -1, -phi), (0, 1, -phi),
            (phi, 0, -1), (phi, 0, 1), (-phi, 0, -1), (-phi, 0, 1),
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    tris = verts[np.array(faces)]
    for _ in range(subdiv):
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
        # re-project midpoints to the sphere
        ab /= np.linalg.norm(ab, axis=-1, keepdims=True)
        bc /= np.linalg.norm(bc, axis=-1, keepdims=True)
        ca /= np.linalg.norm(ca, axis=-1, keepdims=True)
        tris = np.concatenate(
            [
                np.stack([a, ab, ca], 1),
                np.stack([ab, b, bc], 1),
                np.stack([ca, bc, c], 1),
                np.stack([ab, bc, ca], 1),
            ],
            axis=0,
        )
    return (tris * radius).astype(np.float32)
