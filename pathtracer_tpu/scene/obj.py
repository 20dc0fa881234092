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
