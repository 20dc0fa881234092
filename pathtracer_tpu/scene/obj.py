"""Wavefront OBJ mesh loading.

Realizes the reference's declared-but-empty mesh path: ``GEOMTYPE::MESH``
exists (sceneStructs.h:14), the scene loader accepts ``*.obj`` object
types (scene.cpp:63-66), and the trace kernel's MESH branch is an empty
TODO (raytraceKernel.cu:144-145).  Supported OBJ subset: ``v`` positions,
``vt`` texture coordinates, ``vn`` normals, and ``f`` faces (any arity,
fan-triangulated; full ``v/vt/vn`` index syntax; negative indices
supported).  Authored UVs drive image textures (instead of box mapping)
and authored normals give smooth shading (instead of flat facets) — the
reference's mesh + texture electives together imply both
(README.md:57-58).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass(frozen=True)
class MeshData:
    """Host-side mesh: expanded per-corner arrays in file (face) order."""

    verts: np.ndarray  # [T, 3, 3] float32 positions (mesh object space)
    uv: np.ndarray | None  # [T, 3, 2] float32 authored texcoords, or None
    norm: np.ndarray | None  # [T, 3, 3] float32 authored unit normals, or None


def load_obj_full(path: str) -> MeshData:
    """Load an OBJ file -> :class:`MeshData`.  ``uv``/``norm`` are present
    only when EVERY face corner references one (partial attribution is
    dropped — interpolating across unattributed corners would invent
    data)."""
    verts, uvs, norms = [], [], []
    tris, tri_uvs, tri_norms = [], [], []
    any_missing_uv = False
    any_missing_norm = False

    def resolve(i: int, n: int) -> int:
        return i - 1 if i > 0 else n + i

    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "v" and len(parts) >= 4:
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "vt" and len(parts) >= 3:
                uvs.append([float(parts[1]), float(parts[2])])
            elif parts[0] == "vn" and len(parts) >= 4:
                norms.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "f" and len(parts) >= 4:
                vi, ti, ni = [], [], []
                for tok in parts[1:]:
                    fields = tok.split("/")
                    vi.append(resolve(int(fields[0]), len(verts)))
                    if len(fields) >= 2 and fields[1]:
                        ti.append(resolve(int(fields[1]), len(uvs)))
                    else:
                        ti.append(None)
                    if len(fields) >= 3 and fields[2]:
                        ni.append(resolve(int(fields[2]), len(norms)))
                    else:
                        ni.append(None)
                for k in range(1, len(vi) - 1):  # fan triangulation
                    corners = (0, k, k + 1)
                    tris.append(tuple(vi[c] for c in corners))
                    if all(ti[c] is not None for c in corners):
                        tri_uvs.append(tuple(ti[c] for c in corners))
                    else:
                        any_missing_uv = True
                    if all(ni[c] is not None for c in corners):
                        tri_norms.append(tuple(ni[c] for c in corners))
                    else:
                        any_missing_norm = True
    if not tris:
        raise ValueError(f"{path}: OBJ has no faces")
    v = np.asarray(verts, np.float32)
    t = np.asarray(tris, np.int64)
    if t.min() < 0 or t.max() >= len(v):
        raise ValueError(f"{path}: face index out of range")

    uv = None
    if uvs and not any_missing_uv and len(tri_uvs) == len(tris):
        ti = np.asarray(tri_uvs, np.int64)
        if ti.min() < 0 or ti.max() >= len(uvs):
            raise ValueError(f"{path}: vt index out of range")
        uv = np.asarray(uvs, np.float32)[ti]  # [T, 3, 2]
    norm = None
    if norms and not any_missing_norm and len(tri_norms) == len(tris):
        ni = np.asarray(tri_norms, np.int64)
        if ni.min() < 0 or ni.max() >= len(norms):
            raise ValueError(f"{path}: vn index out of range")
        nn = np.asarray(norms, np.float32)[ni]  # [T, 3, 3]
        norm = nn / np.maximum(
            np.linalg.norm(nn, axis=-1, keepdims=True), 1e-12
        )
    return MeshData(verts=v[t], uv=uv, norm=norm)


def load_obj(path: str) -> np.ndarray:
    """Load an OBJ file -> expanded triangle vertices ``[T, 3, 3]`` float32
    (mesh object space).  Positions only; see :func:`load_obj_full` for
    authored UVs/normals."""
    return load_obj_full(path).verts


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
