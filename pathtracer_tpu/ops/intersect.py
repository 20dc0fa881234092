"""Batched, branch-free primitive intersection.

TPU-native re-design of the reference's per-thread intersection header
(``src/intersections.h``): unit primitives in object space (sphere r=0.5,
cube side 1, ``intersections.h:73-75,168``) tested via the inverse
transform, but computed as one vectorized ``[N rays, G geoms]`` sweep with
``jnp.where`` masks instead of early returns, so the whole thing maps onto
the VPU and is smooth-almost-everywhere under ``jax.grad``.

A key simplification over the reference: the reference re-normalizes the
object-space direction and converts the hit back to a world-space distance
via two matrix multiplies and a ``length`` (``intersections.h:188-201``).
We leave the object-space direction **unnormalized**; because the
instance map is affine, the ray parameter ``t`` is then shared between
object and world space, so ``t`` from the object-space quadratic/slab test
is already the world-space distance (given ``|d_world| = 1``) and the hit
point is just ``o + t*d`` — no back-transform needed for ``t``.

Box face normals: the reference picks the face by epsilon-chained ifs
(``intersections.h:144-156``); we use argmax over ``|p_obj|`` (smooth a.e.,
SURVEY.md §7 hard-parts list).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pathtracer_tpu.ops.transforms import transform_dir, transform_normal, transform_point
from pathtracer_tpu.scene.structs import CUBE, MESH, SPHERE, Geoms, Rays, pytree_dataclass

# "miss" sentinel (finite: keeps grads NaN-free).  Plain python float, NOT a
# jnp array: module-level jax Arrays get lifted into compiled executables as
# weakly-held const-args in this jax version, which breaks later calls.
BIG = 1e30
T_MIN = 1e-4  # min accepted hit distance (reference getPointOnRay bias, intersections.h:46-48)


@pytree_dataclass
class Hit:
    """Per-ray nearest-hit record (SoA)."""

    t: jax.Array  # [N] world-space distance; >= BIG => miss
    hit: jax.Array  # [N] bool
    geom_id: jax.Array  # [N] int32 (valid only where hit)
    material_id: jax.Array  # [N] int32
    position: jax.Array  # [N, 3] world-space hit point
    position_obj: jax.Array  # [N, 3] hit point in the winning geom's object space
    normal: jax.Array  # [N, 3] world-space unit normal
    # authored texture coordinates (OBJ ``vt`` records, barycentrically
    # interpolated at mesh hits) — None when no mesh in the scene carries
    # them; ``uv_valid`` masks the lanes whose winner has authored UVs
    # (other lanes fall back to procedural box/sphere mapping downstream)
    uv: Any = None  # [N, 2]
    uv_valid: Any = None  # [N] bool


def _safe_div(num, den, eps=1e-12):
    den = jnp.where(jnp.abs(den) < eps, jnp.where(den >= 0, eps, -eps), den)
    return num / den


def _safe_recip(x, eps=1e-12):
    return 1.0 / jnp.where(jnp.abs(x) < eps, jnp.where(x >= 0, eps, -eps), x)


# ---------------------------------------------------------------------------
# Component-plane primitive tests — shared by the XLA sweep (below) and the
# Pallas kernel (ops/intersect_pallas.py).  Inputs are separate x/y/z
# arrays of any (identical) shape; every op is a full-width VPU op with no
# minor-dim-3 padding.  Grad-safe: the sqrt argument is where-guarded so
# invalid lanes contribute no NaN cotangents.
# ---------------------------------------------------------------------------


def sphere_t_planes(ox, oy, oz, dx, dy, dz, t_min=T_MIN):
    """Unit-sphere (r=0.5) nearest-positive t on component planes.
    Same math as :func:`sphere_t` (intersections.h:168-204)."""
    a = dx * dx + dy * dy + dz * dz
    b = ox * dx + oy * dy + oz * dz
    c = ox * ox + oy * oy + oz * oz - 0.25
    disc = b * b - a * c
    valid = disc > 0.0
    sq = jnp.sqrt(jnp.where(valid, disc, 1.0))
    inv_a = _safe_recip(a)
    t0 = (-b - sq) * inv_a
    t1 = (-b + sq) * inv_a
    t = jnp.where(t0 > t_min, t0, t1)
    return jnp.where(valid & (t > t_min), t, BIG)


def cube_t_planes(ox, oy, oz, dx, dy, dz, t_min=T_MIN):
    """Unit-cube slab test on component planes (intersections.h:78-164)."""
    ix, iy, iz = _safe_recip(dx), _safe_recip(dy), _safe_recip(dz)
    tlx, thx = (-0.5 - ox) * ix, (0.5 - ox) * ix
    tly, thy = (-0.5 - oy) * iy, (0.5 - oy) * iy
    tlz, thz = (-0.5 - oz) * iz, (0.5 - oz) * iz
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(tlx, thx), jnp.minimum(tly, thy)),
        jnp.minimum(tlz, thz),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(tlx, thx), jnp.maximum(tly, thy)),
        jnp.maximum(tlz, thz),
    )
    valid = (t_far >= t_near) & (t_far > t_min)
    t = jnp.where(t_near > t_min, t_near, t_far)
    return jnp.where(valid & (t > t_min), t, BIG)


def sphere_t(o_obj: jax.Array, d_obj: jax.Array, t_min=T_MIN) -> jax.Array:
    """Nearest positive intersection parameter with the unit sphere
    (radius 0.5) or BIG.  ``o_obj``/``d_obj``: ``[..., 3]`` object-space ray
    (direction deliberately unnormalized — see module docstring).
    Reference analog: ``sphereIntersectionTest`` (intersections.h:168-204).
    """
    a = jnp.sum(d_obj * d_obj, axis=-1)
    b = jnp.sum(o_obj * d_obj, axis=-1)
    c = jnp.sum(o_obj * o_obj, axis=-1) - 0.25
    disc = b * b - a * c
    valid = disc > 0
    # sqrt argument forced to 1 on invalid lanes: sqrt(0) has an infinite
    # derivative and 0-cotangent * inf = NaN would leak through the where
    sq = jnp.sqrt(jnp.where(valid, disc, 1.0))
    inv_a = _safe_div(1.0, a)
    t0 = (-b - sq) * inv_a
    t1 = (-b + sq) * inv_a
    t = jnp.where(t0 > t_min, t0, t1)
    return jnp.where(valid & (t > t_min), t, BIG)


def cube_t(o_obj: jax.Array, d_obj: jax.Array, t_min=T_MIN) -> jax.Array:
    """Nearest positive intersection with the unit cube [-0.5, 0.5]^3 or
    BIG, via the slab method (reference: ``boxIntersectionTest``,
    intersections.h:78-164, which unrolls the same slab logic per axis)."""
    inv_d = _safe_div(1.0, d_obj)
    t_lo = (-0.5 - o_obj) * inv_d
    t_hi = (0.5 - o_obj) * inv_d
    t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    valid = (t_far >= t_near) & (t_far > t_min)
    t = jnp.where(t_near > t_min, t_near, t_far)
    return jnp.where(valid & (t > t_min), t, BIG)


def sphere_normal_obj(p_obj: jax.Array) -> jax.Array:
    n = p_obj
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-12)


def cube_normal_obj(p_obj: jax.Array) -> jax.Array:
    """Face normal by argmax |coord| — one-hot with the sign of that
    coordinate (branch-free version of intersections.h:144-156)."""
    ax = jnp.abs(p_obj)
    face = jnp.argmax(ax, axis=-1)
    onehot = jax.nn.one_hot(face, 3, dtype=p_obj.dtype)
    return onehot * jnp.sign(
        jnp.take_along_axis(p_obj, face[..., None], axis=-1)
    )


def intersect_t_sweep(rays: Rays, geoms: Geoms, t_min=T_MIN) -> jax.Array:
    """Distance-only sweep: ``t[N, G]`` for every (ray, geom) pair.

    This is the reference's per-thread geom loop
    (``raytraceKernel.cu:137-148``) turned into a dense rank-2 computation
    on **component planes**: every intermediate is ``[N, G]`` (the naive
    ``[N, G, 3]`` object-space-ray formulation pads its minor dimension of
    3 to 128 lanes on TPU).  Normals are *not* computed here (they're
    recovered for the argmin geom only, in :func:`intersect_scene`) which
    keeps the sweep bandwidth-lean.  Pure jnp => differentiable; the
    forward-only Pallas twin is ops/intersect_pallas.py.
    """
    inv = geoms.inv_transform  # [G, 4, 4]
    m = [[inv[None, :, i, j] for j in range(4)] for i in range(3)]  # [1, G]
    ox, oy, oz = (rays.origin[:, i, None] for i in range(3))  # [N, 1]
    dx, dy, dz = (rays.direction[:, i, None] for i in range(3))

    oox = m[0][0] * ox + m[0][1] * oy + m[0][2] * oz + m[0][3]
    ooy = m[1][0] * ox + m[1][1] * oy + m[1][2] * oz + m[1][3]
    ooz = m[2][0] * ox + m[2][1] * oy + m[2][2] * oz + m[2][3]
    odx = m[0][0] * dx + m[0][1] * dy + m[0][2] * dz
    ody = m[1][0] * dx + m[1][1] * dy + m[1][2] * dz
    odz = m[2][0] * dx + m[2][1] * dy + m[2][2] * dz

    ts = sphere_t_planes(oox, ooy, ooz, odx, ody, odz, t_min)
    tc = cube_t_planes(oox, ooy, ooz, odx, ody, odz, t_min)
    gtype = geoms.type[None, :]
    t = jnp.where(gtype == SPHERE, ts, jnp.where(gtype == CUBE, tc, BIG))
    return t


def take_rows(table: jax.Array, idx: jax.Array, max_onehot: int = 1024) -> jax.Array:
    """``table[idx]`` as a one-hot MXU contraction instead of a gather.

    Profiled (smooth_mesh, v5e r4): a [262k] row gather from a tiny
    [320, 3, 3] table costs ~2.1 ms PER CALL (~8 ns/row serialized HBM
    transactions) plus a layout copy — 96% of that scene's entire render
    time was gathers.  The same lookup as ``onehot[N, T] @ table[T, K]``
    is a sub-millisecond MXU matmul whose one-hot XLA fuses into the
    tiles.  fp32 HIGHEST precision => exact row values.  Integer tables
    ride as f32 (exact to 2^24) and cast back.  The one-hot GENERATION
    costs O(N*T) VPU work, so beyond ``max_onehot`` rows the gather wins
    again (measured crossover: a [4096, 3] atlas table regressed 33 ->
    12 Mrays/s under one-hot at 262k lanes, while [320] tables win 2x)
    — large tables fall back to the gather."""
    t_rows = table.shape[0]
    if t_rows > max_onehot:
        return jnp.take(table, idx, axis=0, mode="clip")
    flat = table.reshape(t_rows, -1)
    is_int = jnp.issubdtype(flat.dtype, jnp.integer)
    if is_int:
        flat = flat.astype(jnp.float32)
    onehot = jax.nn.one_hot(idx, t_rows, dtype=jnp.float32)
    out = jnp.matmul(onehot, flat, precision=jax.lax.Precision.HIGHEST)
    if is_int:
        out = jnp.round(out).astype(table.dtype)
    return out.reshape(idx.shape + table.shape[1:])


def select_rows(onehot: jax.Array, table: jax.Array) -> jax.Array:
    """``table[argmax(onehot)]`` as a one-hot contraction ``[N,G] @ [G,K]``.

    Replaces per-ray row gathers: on TPU a gather costs serialized HBM
    transactions per element, while this is one small dense matmul the MXU
    eats for free (G is tiny).  fp32 HIGHEST precision — exactness matters
    (transform rows).  Also gives clean gradients to every table row,
    weighted by the (stop-gradient-free) one-hot."""
    flat = table.reshape(table.shape[0], -1)
    out = jnp.matmul(onehot, flat, precision=jax.lax.Precision.HIGHEST)
    return out.reshape((onehot.shape[0],) + table.shape[1:])


def mt_chunk_t(o_obj, d_obj, cv0, ce1, ce2, t_min=T_MIN):
    """Raw Moeller-Trumbore t-matrix ``[N rays, chunk tris]`` (BIG = miss).

    Written as **component planes**: every intermediate is ``[N, chunk]``
    (full-width (8,128) vector tiles).  The naive broadcastped
    ``jnp.cross`` formulation materializes ``[N, chunk, 3]`` arrays whose
    minor dimension of 3 pads to 128 lanes — measured ~15x slower on TPU.
    """
    ox, oy, oz = (o_obj[:, i, None] for i in range(3))  # [N, 1]
    dx, dy, dz = (d_obj[:, i, None] for i in range(3))
    v0x, v0y, v0z = (cv0[None, :, i] for i in range(3))  # [1, C]
    e1x, e1y, e1z = (ce1[None, :, i] for i in range(3))
    e2x, e2y, e2z = (ce2[None, :, i] for i in range(3))

    # h = d x e2
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz  # [N, C]
    f = _safe_div(1.0, a)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    ok = (
        (jnp.abs(a) > 1e-12)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(ok, t, BIG)


def mt_chunk_planes(
    o_obj, d_obj, cv0, ce1, ce2, best_t, best_n, t_min=T_MIN,
    best_i=None, base_index=None,
):
    """One Moeller-Trumbore pass of ``[N rays] x [chunk tris]`` updating
    the running nearest hit ``(best_t [N], best_n [N, 3])`` — and, when
    ``best_i``/``base_index`` are given, the winning triangle index
    ``best_i [N] = base_index + argmin`` (index into the caller's
    scan-order triangle array).  ``best_n=None`` skips normal tracking
    entirely (the winner's normal is recovered ONCE after the scan from
    its triangle — profiled r4: the per-chunk normal one-hot was ~45% of
    the mesh sweep's device time)."""
    t = mt_chunk_t(o_obj, d_obj, cv0, ce1, ce2, t_min)
    idx = jnp.argmin(t, axis=-1)  # [N]
    t_best_chunk = jnp.min(t, axis=-1)
    better = t_best_chunk < best_t
    if best_n is not None:
        n_chunk = jnp.cross(ce1, ce2)  # [C, 3] face normals (small)
        n_pick = take_rows(n_chunk, idx)  # one-hot matmul, not a gather
        best_n = jnp.where(better[:, None], n_pick, best_n)
    best_t = jnp.minimum(best_t, t_best_chunk)
    if best_i is None:
        return best_t, best_n
    best_i = jnp.where(better, base_index + idx.astype(jnp.int32), best_i)
    return best_t, best_n, best_i


def mt_chunk_min_t(o_obj, d_obj, cv0, ce1, ce2, best_t, t_min=T_MIN):
    """Occlusion-only Moeller-Trumbore pass: running min t, no argmin,
    no normals (shadow rays need neither)."""
    t = mt_chunk_t(o_obj, d_obj, cv0, ce1, ce2, t_min)
    return jnp.minimum(best_t, jnp.min(t, axis=-1))


def mesh_t_and_normal(o_obj, d_obj, tri_verts, t_min=T_MIN, chunk=128, with_index=False):
    """Nearest triangle hit for object-space rays against a mesh.

    Moeller-Trumbore over all triangles, scanned in fixed-size chunks so
    the [N, T] intermediates never materialize beyond [N, chunk] (XLA
    fuses each chunk into one VPU pass).  Returns ``(t [N], n_obj [N,3])``
    with unnormalized face normals (normalized downstream); with
    ``with_index`` also the winning triangle row in ``tri_verts``.  This
    is the realization of the reference's empty MESH branch
    (raytraceKernel.cu:144-145).
    """
    n = o_obj.shape[0]
    t_count = tri_verts.shape[0]
    pad = (-t_count) % chunk
    if pad:
        # degenerate (zero-area) triangles never hit
        tri_verts = jnp.concatenate(
            [tri_verts, jnp.zeros((pad, 3, 3), tri_verts.dtype)], axis=0
        )
    n_chunks = tri_verts.shape[0] // chunk
    tri_chunks = tri_verts.reshape(-1, chunk, 3, 3)

    v0 = tri_chunks[:, :, 0]
    e1 = tri_chunks[:, :, 1] - tri_chunks[:, :, 0]
    e2 = tri_chunks[:, :, 2] - tri_chunks[:, :, 0]
    base = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(carry, xs):
        cv0, ce1, ce2, b = xs  # [chunk, 3] each + scalar chunk base
        t_c, _, i_c = mt_chunk_planes(
            o_obj, d_obj, cv0, ce1, ce2, carry[0], None, t_min,
            best_i=carry[1], base_index=b,
        )
        return (t_c, i_c), None

    init = (
        jnp.full((n,), BIG, jnp.float32),
        jnp.zeros((n,), jnp.int32),
    )
    if n_chunks <= 8:
        # small meshes: ONE Moeller-Trumbore pass over the whole [N, T']
        # t-matrix with a single min + argmin — the per-chunk scan paid a
        # (min, argmin, select) reduce triple PER CHUNK, each re-reading
        # a materialized [N, 128] t (measured r5: 320-tri smooth_mesh,
        # the reduces were ~2/3 of the sweep).  Tie semantics identical:
        # first index wins in both formulations.
        flat = tri_verts  # [T', 3, 3], already padded
        t_all = mt_chunk_t(
            o_obj, d_obj, flat[:, 0], flat[:, 1] - flat[:, 0],
            flat[:, 2] - flat[:, 0], t_min,
        )
        best_t = jnp.min(t_all, axis=-1)
        best_i = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
    else:
        (best_t, best_i), _ = jax.lax.scan(body, init, (v0, e1, e2, base))
    best_n = winner_face_normal(tri_verts, best_i)
    if with_index:
        return best_t, best_n, best_i
    return best_t, best_n


def winner_face_normal(scan_verts, best_i):
    """Unnormalized face normal of the winning triangle, recovered ONCE
    from its row (identical to the per-chunk cross the scan used to
    track: cross(v1-v0, v2-v0) of the same winner)."""
    tri = take_rows(scan_verts, jax.lax.stop_gradient(best_i))
    return jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])


def mesh_query(m, o_obj, d_obj, t_min=T_MIN, with_index=False):
    """Nearest-triangle query for one MeshInstance.

    On TPU, meshes whose triangle table fits SMEM run the Pallas
    register-resident sweep (ops/mesh_pallas.py — (best_t, best_i) live
    in VMEM, no [N, T] t-matrix, bit-identical results), wrapped in a
    root-AABB short-circuit.  Larger meshes keep the chunked-LBVH
    traversal (accel present) or the dense XLA sweep.  With
    ``with_index``, also returns the winning triangle's row in
    :func:`mesh_scan_verts`' array (scan order)."""
    from pathtracer_tpu.ops.mesh_pallas import (
        mesh_nearest_pallas,
        mesh_pallas_wanted,
    )

    scan_verts = mesh_scan_verts(m)
    if mesh_pallas_wanted(scan_verts.shape[0]):
        from pathtracer_tpu.ops.accel import _aabb_hits_any, _safe_recip

        n = o_obj.shape[0]
        miss = (
            jnp.full((n,), BIG, jnp.float32),
            jnp.zeros((n,), jnp.int32),
        )
        if m.accel is not None:
            lo, hi = m.accel.root_lo, m.accel.root_hi
        else:
            lo = jnp.min(scan_verts, axis=(0, 1))  # O(T), hoisted
            hi = jnp.max(scan_verts, axis=(0, 1))
        root_any = _aabb_hits_any(
            o_obj, _safe_recip(d_obj), lo, hi, miss[0], t_min
        )
        t, idx = jax.lax.cond(
            root_any,
            lambda _: mesh_nearest_pallas(scan_verts, o_obj, d_obj, t_min),
            lambda _: miss,
            None,
        )
        nrm = winner_face_normal(scan_verts, idx)
        if with_index:
            return t, nrm, idx
        return t, nrm
    if m.accel is not None:
        from pathtracer_tpu.ops.accel import mesh_t_and_normal_accel

        return mesh_t_and_normal_accel(
            o_obj, d_obj, m.accel, t_min, with_index=with_index
        )
    return mesh_t_and_normal(
        o_obj, d_obj, m.tri_verts, t_min, with_index=with_index
    )


def mesh_occlusion_t(m, o_obj, d_obj, t_min=T_MIN):
    """Nearest-t-only mesh query for shadow rays: the chunk scan carries
    a single running min — no argmin, no winner normal (profiled r4:
    shadow rays paid the full hit machinery for a boolean).  On TPU,
    SMEM-sized meshes run the register-resident Pallas min kernel
    (ops/mesh_pallas.py) behind the same root-AABB short-circuit."""
    tri_verts = m.accel.chunks.reshape(-1, 3, 3) if m.accel is not None else m.tri_verts
    from pathtracer_tpu.ops.mesh_pallas import mesh_min_pallas, mesh_pallas_wanted

    if mesh_pallas_wanted(tri_verts.shape[0]):
        from pathtracer_tpu.ops.accel import _aabb_hits_any, _safe_recip

        n = o_obj.shape[0]
        init = jnp.full((n,), BIG, jnp.float32)
        if m.accel is not None:
            lo, hi = m.accel.root_lo, m.accel.root_hi
        else:
            lo = jnp.min(tri_verts, axis=(0, 1))
            hi = jnp.max(tri_verts, axis=(0, 1))
        root_any = _aabb_hits_any(
            o_obj, _safe_recip(d_obj), lo, hi, init, t_min
        )
        return jax.lax.cond(
            root_any,
            lambda _: mesh_min_pallas(tri_verts, o_obj, d_obj, t_min),
            lambda _: init,
            None,
        )
    t_count = tri_verts.shape[0]
    chunk = 128
    pad = (-t_count) % chunk
    if pad:
        tri_verts = jnp.concatenate(
            [tri_verts, jnp.zeros((pad, 3, 3), tri_verts.dtype)], axis=0
        )
    tri_chunks = tri_verts.reshape(-1, chunk, 3, 3)
    v0 = tri_chunks[:, :, 0]
    e1 = tri_chunks[:, :, 1] - tri_chunks[:, :, 0]
    e2 = tri_chunks[:, :, 2] - tri_chunks[:, :, 0]

    def body(best_t, xs):
        cv0, ce1, ce2 = xs
        return mt_chunk_min_t(o_obj, d_obj, cv0, ce1, ce2, best_t, t_min), None

    n = o_obj.shape[0]
    n_chunks = tri_chunks.shape[0]
    init = jnp.full((n,), BIG, jnp.float32)

    def sweep(_):
        if n_chunks <= 8:  # one whole-mesh pass (see mesh_t_and_normal)
            return mt_chunk_min_t(
                o_obj, d_obj, tri_verts[:, 0],
                tri_verts[:, 1] - tri_verts[:, 0],
                tri_verts[:, 2] - tri_verts[:, 0], init, t_min,
            )
        best_t, _ = jax.lax.scan(body, init, (v0, e1, e2))
        return best_t

    if m.accel is not None:
        # root-AABB short-circuit for shadow rays: most NEE shadow rays
        # point at the light, away from a localized mesh (r5)
        from pathtracer_tpu.ops.accel import _aabb_hits_any, _safe_recip

        root_any = _aabb_hits_any(
            o_obj, _safe_recip(d_obj), m.accel.root_lo, m.accel.root_hi,
            init, t_min,
        )
        return jax.lax.cond(root_any, sweep, lambda _: init, None)
    return sweep(None)


def mesh_scan_verts(m) -> jax.Array:
    """The triangle array, ``[T', 3, 3]``, that :func:`mesh_query`'s
    ``with_index`` indices refer to (Morton scan order for accel'd
    meshes, file order otherwise)."""
    if m.accel is not None:
        return m.accel.chunks.reshape(-1, 3, 3)
    return m.tri_verts


def mesh_winner_attrs(m, o_obj, d_obj, best_i):
    """Authored-attribute shading data at a mesh's winning triangles.

    Given the winner's scan-order triangle row ``best_i [N]``, recompute
    the Moeller-Trumbore barycentrics against just that triangle (an O(N)
    lookup + recompute — never O(N*T)) and interpolate the authored
    per-corner attributes.  Attributes are stored in FILE order; for
    accelerated meshes the PERMUTATION is applied on the TABLE side
    (``tri_verts[scan_to_file]`` — an O(T) row gather, loop-invariant
    and hoisted by XLA) so the per-lane lookup indexes scan order
    directly, instead of mapping every lane's index through a second
    [N]-sized lookup (profiled r4: that mapping was ~40% of the
    remaining mesh time).  Returns ``(smooth_normal_obj | None,
    uv | None)`` (the reference's mesh + texture electives together,
    README.md:57-58)."""
    idx = jax.lax.stop_gradient(best_i)
    verts = m.tri_verts
    norms = m.tri_norm
    uvs = m.tri_uv
    if m.accel is not None:
        # table-side permutation: gradients through the [T] gather
        # scatter-add back to file order exactly
        verts = m.tri_verts[m.accel.scan_to_file]
        norms = None if norms is None else norms[m.accel.scan_to_file]
        uvs = None if uvs is None else uvs[m.accel.scan_to_file]
    tri = take_rows(verts, idx)  # [N, 3, 3] via one-hot matmul
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    h = jnp.cross(d_obj, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = _safe_recip(a)
    s = o_obj - v0
    u = jnp.clip(f * jnp.sum(s * h, axis=-1), 0.0, 1.0)
    q = jnp.cross(s, e1)
    v = jnp.clip(f * jnp.sum(d_obj * q, axis=-1), 0.0, 1.0)
    w0 = jnp.clip(1.0 - u - v, 0.0, 1.0)

    n_sm = None
    if norms is not None:
        nc = take_rows(norms, idx)  # [N, 3, 3]
        n_sm = (
            w0[:, None] * nc[:, 0]
            + u[:, None] * nc[:, 1]
            + v[:, None] * nc[:, 2]
        )
        n_sm = n_sm / jnp.linalg.norm(n_sm, axis=-1, keepdims=True).clip(1e-12)
    uv = None
    if uvs is not None:
        uvc = take_rows(uvs, idx)  # [N, 3, 2]
        uv = (
            w0[:, None] * uvc[:, 0]
            + u[:, None] * uvc[:, 1]
            + v[:, None] * uvc[:, 2]
        )
    return n_sm, uv


def intersect_scene(rays: Rays, geoms: Geoms, meshes: tuple = (), t_min=T_MIN) -> Hit:
    """Nearest-hit query for a wavefront of rays against all geoms
    (analytic primitives + any triangle-mesh instances)."""
    t_all = intersect_t_sweep(rays, geoms, t_min)  # [N, G]

    # merge mesh instances (static python loop; typically 0-2 per scene)
    mesh_normals = []  # [(geom_index, n_obj [N,3], attrs | None)]
    for m in meshes:
        gi = m.geom_index
        inv = geoms.inv_transform[gi]
        o_obj = transform_point(inv, rays.origin)
        d_obj = transform_dir(inv, rays.direction)
        if m.has_attrs:
            mt, mn, mi = mesh_query(m, o_obj, d_obj, t_min, with_index=True)
            attrs = mesh_winner_attrs(m, o_obj, d_obj, mi)
        else:
            mt, mn = mesh_query(m, o_obj, d_obj, t_min)
            attrs = None
        t_all = t_all.at[:, gi].set(mt)
        mesh_normals.append((gi, mn, attrs))

    geom_id = jnp.argmin(t_all, axis=-1).astype(jnp.int32)  # [N]
    t = jnp.min(t_all, axis=-1)
    hit = t < BIG

    # recompute the winning intersection's local frame; the winner's rows
    # are selected by one-hot contraction, not gather (see select_rows).
    # Indices are discrete => stop_gradient (SURVEY.md §7: compaction /
    # nearest-hit selection must be grad-transparent gathers).
    onehot = jax.nn.one_hot(
        jax.lax.stop_gradient(geom_id), geoms.count, dtype=t_all.dtype
    )
    inv = select_rows(onehot, geoms.inv_transform)  # [N, 4, 4]
    is_sphere = onehot @ (geoms.type == SPHERE).astype(t_all.dtype)
    material_id = (
        onehot @ geoms.material_id.astype(t_all.dtype)
    ).astype(jnp.int32)

    t_safe = jnp.where(hit, t, 1.0)
    p_world = rays.origin + t_safe[:, None] * rays.direction
    p_obj = transform_point(inv, p_world)
    n_obj = jnp.where(
        (is_sphere > 0.5)[:, None],
        sphere_normal_obj(p_obj),
        cube_normal_obj(p_obj),
    )
    n_rays = rays.origin.shape[0]
    any_uv = any(a is not None and a[1] is not None for _, _, a in mesh_normals)
    uv = jnp.zeros((n_rays, 2), jnp.float32) if any_uv else None
    uv_valid = jnp.zeros((n_rays,), bool) if any_uv else None
    for gi, mn, attrs in mesh_normals:
        sel1 = geom_id == gi
        sel = sel1[:, None]
        mn_unit = mn / jnp.linalg.norm(mn, axis=-1, keepdims=True).clip(1e-12)
        if attrs is not None and attrs[0] is not None:
            mn_unit = attrs[0]  # authored smooth normal (already unit)
        n_obj = jnp.where(sel, mn_unit, n_obj)
        if attrs is not None and attrs[1] is not None:
            uv = jnp.where(sel, attrs[1], uv)
            uv_valid = uv_valid | (sel1 & hit)
    n_world = transform_normal(inv, n_obj)

    return Hit(
        t=t,
        hit=hit,
        geom_id=geom_id,
        material_id=material_id,
        position=p_world,
        position_obj=p_obj,
        normal=n_world,
        uv=uv,
        uv_valid=uv_valid,
    )


# ---------------------------------------------------------------------------
# Gradient-lean nearest hit (render/diff.py backward path).
#
# jax.grad of :func:`intersect_scene` transposes the entire O(N*G) sweep
# (and the O(N*T) mesh scan).  But the *winner* is discrete: locally, the
# differentiable quantity is just the winning primitive's t.  So: find the
# winner with gradients stopped (optionally on the fused Pallas kernel —
# zero tangents mean jax never needs its missing JVP rule), then re-derive
# t / hit frame for the winning geom only — an O(N) recompute whose
# transpose is what backward actually pays for.  Equal to intersect_scene
# almost everywhere (identical formulas on the argmin branch).
# ---------------------------------------------------------------------------


def mt_single(o_obj, d_obj, tri, t_min=T_MIN):
    """Differentiable Moeller-Trumbore of ray i against triangle i.
    ``tri``: [N, 3, 3].  Returns ``(t [N], n_obj [N, 3] unnormalized)``."""
    v0 = tri[:, 0]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    h = jnp.cross(d_obj, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = _safe_recip(a)
    s = o_obj - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d_obj * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    ok = (
        (jnp.abs(a) > 1e-12)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(ok, t, BIG), jnp.cross(e1, e2)


def mesh_only_hit(rays: Rays, geoms: Geoms, meshes: tuple, t_min=T_MIN, with_attrs=False):
    """Nearest hit across the MESH instances only: ``(t [N], p_obj [N,3],
    normal_world_unit [N,3], material_id [N], geom_id [N])`` with
    ``t >= BIG`` = miss.  Used by the fused bounce kernel's mesh-merge
    path (ops/bounce_pallas.py) and the split Pallas intersector: the
    analytic winner search runs in-kernel and this externally-computed
    mesh winner is merged in.  ``with_attrs`` additionally returns
    ``(uv [N,2], uv_valid [N])`` and substitutes authored smooth normals
    at attributed-mesh winners (OBJ vt/vn)."""
    n = rays.origin.shape[0]
    t = jnp.full((n,), BIG, jnp.float32)
    pobj = jnp.zeros((n, 3), jnp.float32)
    nrm = jnp.zeros((n, 3), jnp.float32)
    mid = jnp.zeros((n,), jnp.int32)
    gid = jnp.zeros((n,), jnp.int32)
    uv = jnp.zeros((n, 2), jnp.float32)
    uv_valid = jnp.zeros((n,), bool)
    for m in meshes:
        gi = m.geom_index
        inv = geoms.inv_transform[gi]
        o_obj = transform_point(inv, rays.origin)
        d_obj = transform_dir(inv, rays.direction)
        if with_attrs and m.has_attrs:
            mt, mn, mi = mesh_query(m, o_obj, d_obj, t_min, with_index=True)
            n_sm, m_uv = mesh_winner_attrs(m, o_obj, d_obj, mi)
        else:
            mt, mn = mesh_query(m, o_obj, d_obj, t_min)
            n_sm, m_uv = None, None
        better = mt < t
        t_safe = jnp.where(better, mt, 1.0)
        mpo = o_obj + t_safe[:, None] * d_obj
        mn_unit = mn / jnp.linalg.norm(mn, axis=-1, keepdims=True).clip(1e-12)
        if n_sm is not None:
            mn_unit = n_sm
        mnw = transform_normal(inv, mn_unit)
        b = better[:, None]
        t = jnp.where(better, mt, t)
        pobj = jnp.where(b, mpo, pobj)
        nrm = jnp.where(b, mnw, nrm)
        mid = jnp.where(better, geoms.material_id[gi], mid)
        gid = jnp.where(better, gi, gid)
        # a winning mesh WITHOUT authored UVs must clear uv_valid a
        # previous mesh may have set on the same lane
        uv_valid = jnp.where(better, m_uv is not None, uv_valid)
        if m_uv is not None:
            uv = jnp.where(b, m_uv, uv)
    if with_attrs:
        return t, pobj, nrm, mid, gid, uv, uv_valid
    return t, pobj, nrm, mid, gid


def mesh_only_occlusion(rays: Rays, geoms: Geoms, meshes: tuple, t_min=T_MIN):
    """Nearest ``t`` per ray over the MESH instances only (BIG = clear)."""
    n = rays.origin.shape[0]
    t = jnp.full((n,), BIG, jnp.float32)
    for m in meshes:
        inv = geoms.inv_transform[m.geom_index]
        o_obj = transform_point(inv, rays.origin)
        d_obj = transform_dir(inv, rays.direction)
        t = jnp.minimum(t, mesh_occlusion_t(m, o_obj, d_obj, t_min))
    return t


def occlusion_split_t(
    rays: Rays, geoms: Geoms, materials, meshes: tuple = (), t_min=T_MIN
):
    """``(t_opaque [N], t_refractive [N])`` — nearest shadow-ray hit over
    the NON-refractive geoms and over the refractive ones, separately
    (BIG = none).  Volumetric NEE treats refractive interfaces as
    transparent-with-transmittance: the first refractive ``t`` bounds the
    in-medium segment, only opaque geometry blocks (render/common.py)."""
    t_all = intersect_t_sweep(rays, geoms, t_min)  # [N, G]
    refr = (materials.has_refractive[geoms.material_id] > 0.0)[None, :]
    t_op = jnp.min(jnp.where(refr, BIG, t_all), axis=-1)
    t_re = jnp.min(jnp.where(refr, t_all, BIG), axis=-1)
    for m in meshes:
        inv = geoms.inv_transform[m.geom_index]
        o_obj = transform_point(inv, rays.origin)
        d_obj = transform_dir(inv, rays.direction)
        mt = mesh_occlusion_t(m, o_obj, d_obj, t_min)
        m_refr = materials.has_refractive[geoms.material_id[m.geom_index]] > 0.0
        t_op = jnp.where(m_refr, t_op, jnp.minimum(t_op, mt))
        t_re = jnp.where(m_refr, jnp.minimum(t_re, mt), t_re)
    return t_op, t_re


def occlusion_t(rays: Rays, geoms: Geoms, meshes: tuple = (), t_min=T_MIN) -> jax.Array:
    """Nearest ``t`` per ray over all geometry (BIG = clear) — the
    distance-only XLA sweep for shadow rays."""
    t = jnp.min(intersect_t_sweep(rays, geoms, t_min), axis=-1)
    for m in meshes:
        inv = geoms.inv_transform[m.geom_index]
        o_obj = transform_point(inv, rays.origin)
        d_obj = transform_dir(inv, rays.direction)
        t = jnp.minimum(t, mesh_occlusion_t(m, o_obj, d_obj, t_min))
    return t


def intersect_scene_lean(
    rays: Rays,
    geoms: Geoms,
    meshes: tuple = (),
    t_min=T_MIN,
    use_pallas_winner: bool = False,
    interpret: bool = False,
) -> Hit:
    """Nearest-hit query whose backward cost is O(N), not O(N·G + N·T).

    Numerically equal to :func:`intersect_scene` a.e. (same formulas on
    the winning branch); gradients flow to the winner's transform rows,
    the ray, and — for mesh winners — the winning triangle's vertices.
    ``use_pallas_winner`` runs the winner search on the fused Pallas
    kernel (forward-only is fine: its inputs carry zero tangents)."""
    sg = jax.lax.stop_gradient
    rays_sg = Rays(origin=sg(rays.origin), direction=sg(rays.direction))
    geoms_sg = Geoms(
        type=geoms.type,
        material_id=geoms.material_id,
        transform=sg(geoms.transform),
        inv_transform=sg(geoms.inv_transform),
    )

    # ---- 1. winner search, gradient-free
    if use_pallas_winner:
        from pathtracer_tpu.ops.intersect_pallas import winner_t_gid_planes

        t_win, geom_id = winner_t_gid_planes(rays_sg, geoms_sg, interpret=interpret)
    else:
        t_all = intersect_t_sweep(rays_sg, geoms_sg, t_min)
        geom_id = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
        t_win = jnp.min(t_all, axis=-1)
    mesh_tri_idx = {}
    for m in meshes:
        gi = m.geom_index
        inv_g = geoms_sg.inv_transform[gi]
        o_mesh = transform_point(inv_g, rays_sg.origin)
        d_mesh = transform_dir(inv_g, rays_sg.direction)
        m_sg = jax.tree_util.tree_map(sg, m)
        mt, _, mi = mesh_query(m_sg, o_mesh, d_mesh, t_min, with_index=True)
        better = mt < t_win
        t_win = jnp.where(better, mt, t_win)
        geom_id = jnp.where(better, gi, geom_id)
        mesh_tri_idx[gi] = mi
    # tag the (detached) winner-search outputs as the per-bounce remat
    # policy's saved set (render/megakernel.py): the backward recomputes
    # the cheap winner-only shading from the scan carry but never re-runs
    # the O(N*G) sweep / Pallas kernel / O(N*T) mesh scan behind these
    from jax.ad_checkpoint import checkpoint_name

    t_win = checkpoint_name(t_win, "lean_winner")
    geom_id = checkpoint_name(geom_id, "lean_winner")
    mesh_tri_idx = {
        gi: checkpoint_name(mi, "lean_winner")
        for gi, mi in mesh_tri_idx.items()
    }
    hit = t_win < BIG

    # ---- 2. differentiable recompute for the winning geom only —
    # written on component planes ([N] arrays end to end): [N, 3]
    # intermediates pad their minor dimension of 3 to the TPU's 128 lanes,
    # which costs ~40x VPU waste in BOTH the recompute and its transpose
    hp = jax.lax.Precision.HIGHEST
    onehot = jax.nn.one_hot(geom_id, geoms.count, dtype=jnp.float32)
    inv16 = geoms.inv_transform.reshape(geoms.count, 16)
    rows = jnp.matmul(onehot, inv16, precision=hp)  # [N, 16]
    m_ = [rows[:, k] for k in range(12)]
    ox, oy, oz = rays.origin[:, 0], rays.origin[:, 1], rays.origin[:, 2]
    dx, dy, dz = rays.direction[:, 0], rays.direction[:, 1], rays.direction[:, 2]
    oox = m_[0] * ox + m_[1] * oy + m_[2] * oz + m_[3]
    ooy = m_[4] * ox + m_[5] * oy + m_[6] * oz + m_[7]
    ooz = m_[8] * ox + m_[9] * oy + m_[10] * oz + m_[11]
    odx = m_[0] * dx + m_[1] * dy + m_[2] * dz
    ody = m_[4] * dx + m_[5] * dy + m_[6] * dz
    odz = m_[8] * dx + m_[9] * dy + m_[10] * dz

    is_sphere = onehot @ (geoms.type == SPHERE).astype(jnp.float32)
    is_cube = onehot @ (geoms.type == CUBE).astype(jnp.float32)
    material_id = (onehot @ geoms.material_id.astype(jnp.float32)).astype(jnp.int32)

    ts = sphere_t_planes(oox, ooy, ooz, odx, ody, odz, t_min)
    tc = cube_t_planes(oox, ooy, ooz, odx, ody, odz, t_min)
    t_re = jnp.where(is_sphere > 0.5, ts, jnp.where(is_cube > 0.5, tc, BIG))
    mesh_normals = []  # (geom_index, unnormalized n_obj [N, 3])
    if meshes:
        o_obj3 = jnp.stack([oox, ooy, ooz], axis=-1)
        d_obj3 = jnp.stack([odx, ody, odz], axis=-1)
        for m in meshes:
            gi = m.geom_index
            # winner index -> FILE order, then gather from the
            # DIFFERENTIABLE tri_verts (not the accel's detached Morton
            # copy): vertex gradients flow through this gather even when
            # the winner search traversed the LBVH
            idx = sg(mesh_tri_idx[gi])
            verts_tab = m.tri_verts
            if m.accel is not None:
                # permutation on the table side (O(T), hoisted); vertex
                # gradients scatter-add back through it to file order
                verts_tab = m.tri_verts[m.accel.scan_to_file]
            verts = take_rows(verts_tab, idx)  # [N, 3, 3] one-hot matmul
            mt_re, mn = mt_single(o_obj3, d_obj3, verts, t_min)
            sel = geom_id == gi
            t_re = jnp.where(sel, mt_re, t_re)
            mesh_normals.append((gi, mn))
    # boundary-rounding safety: if the winner-only recompute disagrees with
    # the sweep about hitting at all, fall back to the (detached) sweep t
    t = jnp.where(t_re < BIG, t_re, t_win)

    t_safe = jnp.where(hit, t, 1.0)
    px, py, pz = ox + t_safe * dx, oy + t_safe * dy, oz + t_safe * dz
    pox = oox + t_safe * odx
    poy = ooy + t_safe * ody
    poz = ooz + t_safe * odz

    # object-space normal on planes: sphere = radial (differentiable);
    # cube = argmax-|coord| face (piecewise constant — zero gradient, same
    # as cube_normal_obj's one-hot*sign construction)
    axx, axy, axz = jnp.abs(pox), jnp.abs(poy), jnp.abs(poz)
    fx = (axx >= axy) & (axx >= axz)
    fy = (~fx) & (axy >= axz)
    inv_len = jax.lax.rsqrt(jnp.maximum(pox**2 + poy**2 + poz**2, 1e-24))
    sph = is_sphere > 0.5
    nxo = jnp.where(sph, pox * inv_len, jnp.where(fx, jnp.sign(pox), 0.0))
    nyo = jnp.where(sph, poy * inv_len, jnp.where(fy, jnp.sign(poy), 0.0))
    nzo = jnp.where(
        sph, poz * inv_len, jnp.where(fx | fy, 0.0, jnp.sign(poz))
    )
    for gi, mn in mesh_normals:
        sel = geom_id == gi
        mn_len = jax.lax.rsqrt(jnp.maximum(jnp.sum(mn * mn, axis=-1), 1e-24))
        nxo = jnp.where(sel, mn[:, 0] * mn_len, nxo)
        nyo = jnp.where(sel, mn[:, 1] * mn_len, nyo)
        nzo = jnp.where(sel, mn[:, 2] * mn_len, nzo)

    # world normal: inverse-transpose rows (transform_normal, on planes)
    nwx = m_[0] * nxo + m_[4] * nyo + m_[8] * nzo
    nwy = m_[1] * nxo + m_[5] * nyo + m_[9] * nzo
    nwz = m_[2] * nxo + m_[6] * nyo + m_[10] * nzo
    inv_n = jax.lax.rsqrt(jnp.maximum(nwx**2 + nwy**2 + nwz**2, 1e-24))

    return Hit(
        t=t,
        hit=hit,
        geom_id=geom_id,
        material_id=material_id,
        position=jnp.stack([px, py, pz], axis=-1),
        position_obj=jnp.stack([pox, poy, poz], axis=-1),
        normal=jnp.stack([nwx * inv_n, nwy * inv_n, nwz * inv_n], axis=-1),
    )
