"""Fully-fused bounce megakernel: one ``pallas_call`` per path-trace step.

The wavefront engine's per-bounce physics (render/common.py — intersect,
texture/bump, emittance, NEE light sampling + shadow occlusion, BSDF
sampling, volumetrics) as ONE Mosaic kernel.  The split pipeline pays for
every stage's HBM round-trip and the ``[N, 3]``-layout padding between
them; here the whole bounce lives in VMEM registers as component planes,
and the only HBM traffic is the 16 input + 19 output state planes.

Scope: forward engines with the fast counter-hash RNG; every material
feature is modeled in-plane — procedural textures and bump, the full
BSDF set including Cook-Torrance GGX / Ward anisotropic (feature-gated),
volumetrics with Henyey-Greenstein phase and volumetric NEE, and image
textures via the DEFERRED-texel scheme (the kernel emits final UVs +
atlas slots, the wrapper multiplies one bilinear texel into contrib and
the diffuse throughput — both strictly linear in albedo).  Mesh scenes
run the **mesh-merge** variant: the nearest-triangle winner is computed
outside by the XLA chunked-LBVH traversal and merged in as extra input
planes (authored vn smooth normals ride along), and the NEE shadow ray
exits as extra output planes for its triangle-occlusion test (see
``bounce_fused``) — shading stays fully fused.  The split path in
render/common.py stays the source of truth — this kernel is a
plane-for-plane transcription of those exact expressions (the test suite
pins them equal in interpret mode).

Vectors are tuples of ``[rows, 128]`` planes; the ``v*`` helpers make the
transcription read like the [N, 3] original.  The per-geom/material/light
tables ride in SMEM and all table loops are unrolled at trace time (G and
M are small and static).

Reference citations: the per-bounce physics realizes the assignment's
required core (README.md:45-70) over the stub interaction layer
(interactions.h:30-103); see the docstrings of ops/bsdf.py, ops/lights.py
and render/common.py for the per-formula mapping.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.ops.bsdf import RAY_BIAS, SQRT_ONE_THIRD
from pathtracer_tpu.ops.intersect import BIG, T_MIN
from pathtracer_tpu.ops.intersect_pallas import LANES, ROWS, _geom_t, _pack_gdata
from pathtracer_tpu.scene.structs import SPHERE, Scene

TWO_PI = 2.0 * math.pi
INV_PI = 1.0 / math.pi


# ---------------------------------------------------------------------------
# vec3-as-planes helpers
# ---------------------------------------------------------------------------

def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vscale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def vwhere(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def vnormalize(a, eps=1e-24):
    inv = jax.lax.rsqrt(jnp.maximum(vdot(a, a), eps))
    return vscale(inv, a)


def vmul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


# ---------------------------------------------------------------------------
# in-kernel counter-hash RNG — bit-identical to ops/rng.py hash_uniforms
# ---------------------------------------------------------------------------

def _imul(x, c: int):
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    ci = jnp.int32(c - (1 << 32) if c >= (1 << 31) else c)
    return jax.lax.bitcast_convert_type(xi * ci, jnp.uint32)


def _avalanche(x):
    x = x ^ (x >> 16)
    x = _imul(x, 0x7FEB352D)
    x = x ^ (x >> 15)
    x = _imul(x, 0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash_uniforms_planes(seed_u32, sample_i32, depth_i32, n: int):
    """n uniform planes in [0, 1) == ops.rng.hash_uniforms columns."""
    s = jax.lax.bitcast_convert_type(sample_i32, jnp.uint32)
    d = jax.lax.bitcast_convert_type(depth_i32, jnp.uint32)
    base = _avalanche(seed_u32 ^ _imul(s, 0x85EBCA6B) ^ _imul(d + jnp.uint32(1), 0xC2B2AE35))
    out = []
    for k in range(n):
        slot = (k * 0x27D4EB2F) & 0xFFFFFFFF
        bits = _avalanche(base ^ jnp.uint32(slot))
        # >>8 leaves 24 bits, so the int32 bitcast is value-preserving;
        # Mosaic has no u32->f32 cast but s32->f32 is native
        top24 = jax.lax.bitcast_convert_type(bits >> jnp.uint32(8), jnp.int32)
        out.append(top24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24)))
    return out


# ---------------------------------------------------------------------------
# SMEM table packing
# ---------------------------------------------------------------------------

MAT_FIELDS = 28  # matches ops.bsdf.gather_materials column layout exactly


def pack_material_table(materials) -> jax.Array:
    """[M, 28] fp32 — the same column layout as gather_materials
    (ops/bsdf.py), including the Cook-Torrance/Ward/HG and atlas-slot
    columns."""
    m = materials
    return jnp.concatenate(
        [
            m.color, m.specular_color,
            m.has_reflective[:, None], m.has_refractive[:, None],
            m.index_of_refraction[:, None], m.emittance[:, None],
            m.specular_exponent[:, None], m.absorption_coefficient,
            m.has_scatter[:, None], m.reduced_scatter_coefficient[:, None],
            m.texture_type[:, None], m.texture_scale[:, None],
            m.texture_color2, m.bump_scale[:, None], m.bump_amp[:, None],
            m.texture_image[:, None], m.brdf_model[:, None],
            m.roughness[:, None], m.roughness_y[:, None],
            m.phase_g[:, None],
        ],
        axis=-1,
    )


def pack_light_table(geoms, materials) -> jax.Array:
    """[G, 19] fp32 per-geom light data: forward-transform rows 0..2 (12),
    light-pick CDF (1), emitted rgb (3), world per-axis scales (3)."""
    from pathtracer_tpu.ops.lights import light_areas

    fwd12 = geoms.transform.reshape(geoms.count, 16)[:, :12]
    areas = light_areas(geoms, materials)
    total = jnp.maximum(jnp.sum(areas), 1e-20)
    cdf = jnp.cumsum(areas) / total
    emit = (
        materials.color[geoms.material_id]
        * materials.emittance[geoms.material_id][:, None]
    )
    scales = jnp.linalg.norm(geoms.transform[:, :3, :3], axis=1)  # [G, 3]
    return jnp.concatenate([fwd12, cdf[:, None], emit, scales], axis=-1)


def pack_scalars(scene: Scene) -> jax.Array:
    """[2] fp32 misc scalars: total light area, any-light flag."""
    from pathtracer_tpu.ops.lights import light_areas

    areas = light_areas(scene.geoms, scene.materials)
    total = jnp.sum(areas)
    return jnp.stack([total, (total > 0).astype(jnp.float32)])


# ---------------------------------------------------------------------------
# kernel sub-blocks (all plane math)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# in-kernel triangle meshes (r5): SMEM tables + register-resident sweep
# ---------------------------------------------------------------------------

# total triangles across a scene's mesh instances that may ride SMEM
# tables inside the fused kernels (flat f32 arrays: 12+9+6 scalars/tri
# fully attributed = ~440 KB at this cap, under the 1 MB SMEM budget
# with the geom/material/light tables on top)
MESH_INKERNEL_MAX_TRIS = 4096


def mesh_inkernel_eligible(meshes) -> bool:
    """True when every mesh instance can ride the in-kernel SMEM sweep."""
    if not meshes:
        return False
    return sum(m.tri_verts.shape[0] for m in meshes) <= MESH_INKERNEL_MAX_TRIS


MESH_CHUNK = 32  # triangles per culling chunk (in-kernel sweep)


def _morton3_jnp(cent):
    """[T, 3] float centroids -> 30-bit Morton codes (traceable twin of
    ops/accel._morton3 — pack_mesh_tables runs inside jit)."""
    lo = jnp.min(cent, axis=0)
    hi = jnp.max(cent, axis=0)
    ext = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((cent - lo) / ext * 1023.0, 0.0, 1023.0).astype(jnp.int32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def pack_mesh_tables(meshes):
    """Static descriptors + flat SMEM tables for the in-kernel sweep.

    Returns ``(descs, tables)``: per mesh a ``(geom_index, n_chunks,
    has_norm, has_uv)`` static tuple and 2-4 flat float32 arrays —
    ``[Tp*12]`` (v0, e1, e2, face normal), ``[n_chunks*6]`` chunk AABBs
    (lo xyz, hi xyz), then ``[Tp*9]`` corner shading normals and
    ``[Tp*6]`` corner UVs when authored.

    Triangles are MORTON-ORDERED by centroid and grouped into
    :data:`MESH_CHUNK`-sized chunks whose object-space AABBs drive the
    in-kernel culling (``mesh_sweep_planes``): a chunk whose AABB no
    lane of the tile can hit nearer than its current winner is skipped
    with a scalar branch — the 32 Moeller-Trumbore tests never issue.
    The pad rows repeat the last triangle (duplicates cannot change a
    nearest-hit and keep the final chunk's AABB tight —
    ops/accel.build_mesh_accel's trick)."""
    descs = []
    tables = []
    for m in meshes:
        tv = jnp.asarray(m.tri_verts, jnp.float32)
        has_norm = m.tri_norm is not None
        has_uv = m.tri_uv is not None
        tn = jnp.asarray(m.tri_norm, jnp.float32) if has_norm else None
        tu = jnp.asarray(m.tri_uv, jnp.float32) if has_uv else None

        order = jnp.argsort(_morton3_jnp(jnp.mean(tv, axis=1)), stable=True)
        tv = tv[order]
        tn = tn[order] if has_norm else None
        tu = tu[order] if has_uv else None

        t_count = tv.shape[0]
        pad = (-t_count) % MESH_CHUNK
        if pad:
            tv = jnp.concatenate([tv, jnp.repeat(tv[-1:], pad, axis=0)], axis=0)
            if has_norm:
                tn = jnp.concatenate([tn, jnp.repeat(tn[-1:], pad, axis=0)], axis=0)
            if has_uv:
                tu = jnp.concatenate([tu, jnp.repeat(tu[-1:], pad, axis=0)], axis=0)
        n_chunks = tv.shape[0] // MESH_CHUNK

        v0 = tv[:, 0]
        e1 = tv[:, 1] - tv[:, 0]
        e2 = tv[:, 2] - tv[:, 0]
        fn = jnp.cross(e1, e2)
        tables.append(jnp.concatenate([v0, e1, e2, fn], axis=-1).reshape(-1))
        ch = tv.reshape(n_chunks, MESH_CHUNK * 3, 3)
        tables.append(
            jnp.concatenate(
                [jnp.min(ch, axis=1), jnp.max(ch, axis=1)], axis=-1
            ).reshape(-1)
        )
        if has_norm:
            tables.append(tn.reshape(-1))
        if has_uv:
            tables.append(tu.reshape(-1))
        descs.append((int(m.geom_index), int(n_chunks), has_norm, has_uv))
    return tuple(descs), tables


def _chunk_cull_loop(tri_ref, aabb_ref, n_chunks, oo, od, t_min, inner,
                     carry, et_of):
    """Chunk-culled sweep skeleton: fori over Morton chunks; a chunk
    whose AABB intersects no lane's ray nearer than that lane's current
    best (``et_of(carry)``) is skipped with one scalar branch.  Exact:
    chunk AABBs contain their triangles, so any hit in the chunk has
    ``t >= aabb t_enter``."""

    def srecip(x):
        return 1.0 / jnp.where(
            jnp.abs(x) < 1e-12, jnp.where(x >= 0, 1e-12, -1e-12), x
        )

    inv = (srecip(od[0]), srecip(od[1]), srecip(od[2]))

    def chunk_body(c, carry):
        b = c * 6
        t_lo = []
        t_hi = []
        for ax in range(3):
            t1 = (aabb_ref[b + ax] - oo[ax]) * inv[ax]
            t2 = (aabb_ref[b + 3 + ax] - oo[ax]) * inv[ax]
            t_lo.append(jnp.minimum(t1, t2))
            t_hi.append(jnp.maximum(t1, t2))
        tmin = jnp.maximum(
            jnp.maximum(t_lo[0], t_lo[1]), jnp.maximum(t_lo[2], t_min)
        )
        tmax = jnp.minimum(jnp.minimum(t_hi[0], t_hi[1]), t_hi[2])
        inter = (tmax >= tmin) & (tmin < et_of(carry))
        any_hit = jnp.sum(jnp.where(inter, 1.0, 0.0)) > 0.0
        return jax.lax.cond(
            any_hit, lambda cr: inner(c, cr), lambda cr: cr, carry
        )

    return jax.lax.fori_loop(0, n_chunks, chunk_body, carry)


def _obj_ray(m, o, d):
    """Transform ray planes into a geom's object space (gvals rows)."""
    oox = m[0] * o[0] + m[1] * o[1] + m[2] * o[2] + m[3]
    ooy = m[4] * o[0] + m[5] * o[1] + m[6] * o[2] + m[7]
    ooz = m[8] * o[0] + m[9] * o[1] + m[10] * o[2] + m[11]
    odx = m[0] * d[0] + m[1] * d[1] + m[2] * d[2]
    ody = m[4] * d[0] + m[5] * d[1] + m[6] * d[2]
    odz = m[8] * d[0] + m[9] * d[1] + m[10] * d[2]
    return (oox, ooy, ooz), (odx, ody, odz)


def _mt_tri_planes(tri_ref, base, oo, od, t_min):
    """One triangle's Moeller-Trumbore test on object-space ray planes;
    returns ``(t_candidate, u, v)`` (BIG = miss).  Same formula order as
    ops/intersect.mt_chunk_t / ops/mesh_pallas."""
    v0x, v0y, v0z = tri_ref[base], tri_ref[base + 1], tri_ref[base + 2]
    e1x, e1y, e1z = tri_ref[base + 3], tri_ref[base + 4], tri_ref[base + 5]
    e2x, e2y, e2z = tri_ref[base + 6], tri_ref[base + 7], tri_ref[base + 8]
    hx = od[1] * e2z - od[2] * e2y
    hy = od[2] * e2x - od[0] * e2z
    hz = od[0] * e2y - od[1] * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    den = jnp.where(jnp.abs(a) < 1e-12, jnp.where(a >= 0, 1e-12, -1e-12), a)
    f = 1.0 / den
    sx, sy, sz = oo[0] - v0x, oo[1] - v0y, oo[2] - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (od[0] * qx + od[1] * qy + od[2] * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    ok = (
        (jnp.abs(a) > 1e-12)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(ok, t, BIG), u, v


def mesh_sweep_planes(descs, refs, gvals, o, d, t_min, want_uv: bool):
    """In-kernel nearest-triangle winner across all mesh instances.

    ``refs``: the SMEM table refs in :func:`pack_mesh_tables` order.
    Everything the wrapper's external ``mesh_only_hit`` produced is
    tracked at better-time inside the fori loop — hit point, world
    normal (smooth-interpolated where the mesh has authored vn), winner
    material, authored UV — so the result dict is a drop-in for the
    mesh-merge input planes."""
    shape = o[0].shape
    zero = jnp.zeros(shape, jnp.float32)
    et = jnp.full(shape, BIG, jnp.float32)
    epo = (zero, zero, zero)
    enw = (zero, zero, zero)  # unnormalized world normal of the winner
    emid = jnp.zeros(shape, jnp.int32)
    uu, vv, uvv = zero, zero, zero
    ri = 0
    for g, n_chunks, has_norm, has_uv in descs:
        tri_ref = refs[ri]
        aabb_ref = refs[ri + 1]
        ri += 2
        nrm_ref = None
        uv_ref = None
        if has_norm:
            nrm_ref = refs[ri]
            ri += 1
        if has_uv:
            uv_ref = refs[ri]
            ri += 1
        m = gvals[g]
        mid_g = m[13].astype(jnp.int32)
        oo, od = _obj_ray(m, o, d)

        def body(i, carry, tri_ref=tri_ref, nrm_ref=nrm_ref, uv_ref=uv_ref,
                 m=m, mid_g=mid_g, oo=oo, od=od):
            et, epo, enw, emid, uu, vv, uvv = carry
            b = i * 12
            tc, tu, tv_ = _mt_tri_planes(tri_ref, b, oo, od, t_min)
            better = tc < et
            # hit point (this mesh's object space)
            npo = (oo[0] + tc * od[0], oo[1] + tc * od[1], oo[2] + tc * od[2])
            # normal: authored smooth interp (clipped barycentrics, as
            # ops/intersect.mesh_winner_attrs) or the face normal; world
            # via this geom's inverse-transpose (scalar rows)
            if nrm_ref is not None:
                uc = jnp.clip(tu, 0.0, 1.0)
                vc = jnp.clip(tv_, 0.0, 1.0)
                w0 = jnp.clip(1.0 - uc - vc, 0.0, 1.0)
                nb = i * 9
                nx = (w0 * nrm_ref[nb] + uc * nrm_ref[nb + 3]
                      + vc * nrm_ref[nb + 6])
                ny = (w0 * nrm_ref[nb + 1] + uc * nrm_ref[nb + 4]
                      + vc * nrm_ref[nb + 7])
                nz = (w0 * nrm_ref[nb + 2] + uc * nrm_ref[nb + 5]
                      + vc * nrm_ref[nb + 8])
            else:
                nx = tri_ref[b + 9]
                ny = tri_ref[b + 10]
                nz = tri_ref[b + 11]
            nwx = m[0] * nx + m[4] * ny + m[8] * nz
            nwy = m[1] * nx + m[5] * ny + m[9] * nz
            nwz = m[2] * nx + m[6] * ny + m[10] * nz
            et = jnp.where(better, tc, et)
            epo = vwhere(better, npo, epo)
            enw = vwhere(better, (nwx, nwy, nwz), enw)
            emid = jnp.where(better, mid_g, emid)
            if uv_ref is not None:
                ub = i * 6
                uc = jnp.clip(tu, 0.0, 1.0)
                vc = jnp.clip(tv_, 0.0, 1.0)
                w0 = jnp.clip(1.0 - uc - vc, 0.0, 1.0)
                au = (w0 * uv_ref[ub] + uc * uv_ref[ub + 2]
                      + vc * uv_ref[ub + 4])
                av = (w0 * uv_ref[ub + 1] + uc * uv_ref[ub + 3]
                      + vc * uv_ref[ub + 5])
                uu = jnp.where(better, au, uu)
                vv = jnp.where(better, av, vv)
                uvv = jnp.where(better, 1.0, uvv)
            else:
                uvv = jnp.where(better, 0.0, uvv)
            return et, epo, enw, emid, uu, vv, uvv

        def chunk_inner(c, carry):
            def tri_body(j, cr):
                return body(c * MESH_CHUNK + j, cr)

            return jax.lax.fori_loop(0, MESH_CHUNK, tri_body, carry)

        et, epo, enw, emid, uu, vv, uvv = _chunk_cull_loop(
            tri_ref, aabb_ref, n_chunks, oo, od, t_min,
            chunk_inner, (et, epo, enw, emid, uu, vv, uvv),
            et_of=lambda carry: carry[0],
        )
    out = dict(
        et=et,
        epo=epo,
        en=vnormalize(enw, 1e-24),
        emid=emid,
    )
    if want_uv:
        out["muv_u"] = uu
        out["muv_v"] = vv
        out["muvv"] = uvv
    return out


def mesh_occ_planes(descs, refs, gvals, x, wi, t_min):
    """In-kernel nearest-t over all mesh triangles for shadow rays
    (min only — no winner tracking)."""
    occ = jnp.full(x[0].shape, BIG, jnp.float32)
    ri = 0
    for g, n_chunks, has_norm, has_uv in descs:
        tri_ref = refs[ri]
        aabb_ref = refs[ri + 1]
        ri += 2 + (1 if has_norm else 0) + (1 if has_uv else 0)
        oo, od = _obj_ray(gvals[g], x, wi)

        def body(i, occ, tri_ref=tri_ref, oo=oo, od=od):
            tc, _, _ = _mt_tri_planes(tri_ref, i * 12, oo, od, t_min)
            return jnp.minimum(occ, tc)

        def chunk_inner(c, occ, body=body):
            return jax.lax.fori_loop(
                0, MESH_CHUNK, lambda j, oc: body(c * MESH_CHUNK + j, oc), occ
            )

        occ = _chunk_cull_loop(
            tri_ref, aabb_ref, n_chunks, oo, od, t_min,
            chunk_inner, occ, et_of=lambda occ: occ,
        )
    return occ


def mesh_occ_split_planes(descs, refs, gvals, mvals, x, wi, t_min):
    """In-kernel ``(t_opaque, t_refractive)`` over all mesh triangles —
    the volumetric-NEE occlusion split (ops/intersect.occlusion_split_t's
    mesh tail): a mesh whose material is refractive bounds the attenuated
    segment instead of blocking."""
    occ_op = jnp.full(x[0].shape, BIG, jnp.float32)
    occ_re = jnp.full(x[0].shape, BIG, jnp.float32)
    n_materials = len(mvals)
    ri = 0
    for g, n_chunks, has_norm, has_uv in descs:
        tri_ref = refs[ri]
        aabb_ref = refs[ri + 1]
        ri += 2 + (1 if has_norm else 0) + (1 if has_uv else 0)
        gv = gvals[g]
        refr_g = jnp.float32(0.0)
        for m in range(n_materials):
            refr_g = jnp.where(
                gv[13].astype(jnp.int32) == m, mvals[m][7], refr_g
            )
        oo, od = _obj_ray(gv, x, wi)

        def body(i, occ, tri_ref=tri_ref, oo=oo, od=od):
            tc, _, _ = _mt_tri_planes(tri_ref, i * 12, oo, od, t_min)
            return jnp.minimum(occ, tc)

        def chunk_inner(c, occ, body=body):
            return jax.lax.fori_loop(
                0, MESH_CHUNK, lambda j, oc: body(c * MESH_CHUNK + j, oc), occ
            )

        mt = _chunk_cull_loop(
            tri_ref, aabb_ref, n_chunks, oo, od, t_min,
            chunk_inner, jnp.full(x[0].shape, BIG, jnp.float32),
            et_of=lambda occ: occ,
        )
        occ_op = jnp.minimum(occ_op, jnp.where(refr_g > 0.0, BIG, mt))
        occ_re = jnp.minimum(occ_re, jnp.where(refr_g > 0.0, mt, BIG))
    return occ_op, occ_re


def _material_fetch(mvals, mid):
    """Unrolled select-chain material fetch -> dict of planes.

    ``mvals``: ``[M][MAT_FIELDS]`` nested list of scalar VALUES (read from
    the SMEM ref by the kernel wrapper) — value inputs so the whole fetch
    is differentiable w.r.t. the table under in-kernel ``jax.vjp``."""
    cols = [None] * MAT_FIELDS
    for m in range(len(mvals)):
        sel = mid == m
        for k in range(MAT_FIELDS):
            v = mvals[m][k]
            cols[k] = jnp.where(sel, v, cols[k]) if m else jnp.where(sel, v, 0.0)
    return dict(
        color=(cols[0], cols[1], cols[2]),
        spec_color=(cols[3], cols[4], cols[5]),
        has_reflective=cols[6],
        has_refractive=cols[7],
        ior=cols[8],
        emittance=cols[9],
        spec_exp=cols[10],
        absorption=(cols[11], cols[12], cols[13]),
        has_scatter=cols[14],
        scatter_coeff=cols[15],
        texture_type=cols[16],
        texture_scale=cols[17],
        texture_color2=(cols[18], cols[19], cols[20]),
        bump_scale=cols[21],
        bump_amp=cols[22],
        texture_image=cols[23],
        brdf_model=cols[24],
        roughness=cols[25],
        roughness_y=cols[26],
        phase_g=cols[27],
    )


def _atan2_planes(y, x):
    """Plane atan2 — Mosaic has no atan2/atan lowering.  Octant-reduced
    minimax polynomial on [0, 1] (max error ~2e-7 rad, vanishing against
    the texel-grid resolution it feeds)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ay > ax
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    r = num / den
    z = r * r
    p = r * (
        0.99997726
        + z * (-0.33262347
        + z * (0.19354346
        + z * (-0.11643287
        + z * (0.05265332 + z * -0.01172120))))
    )
    a = jnp.where(swap, jnp.float32(0.5 * math.pi) - p, p)
    a = jnp.where(x < 0.0, jnp.float32(math.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _asin_planes(x):
    """Plane asin via atan2(x, sqrt(1-x^2)); input must be in [-1, 1]."""
    return _atan2_planes(x, jnp.sqrt(jnp.clip(1.0 - x * x, 0.0, None)))


def _not_axis_frame(n):
    """Kutz trick tangent frame (interactions.h:62-87): (p1, p2)."""
    ax = (jnp.abs(n[0]), jnp.abs(n[1]), jnp.abs(n[2]))
    use_x = ax[0] < SQRT_ONE_THIRD
    use_y = (~use_x) & (ax[1] < SQRT_ONE_THIRD)
    not_n = (
        jnp.where(use_x, 1.0, 0.0),
        jnp.where(use_y, 1.0, 0.0),
        jnp.where(use_x | use_y, 0.0, 1.0),
    )
    p1 = vnormalize(vcross(n, not_n), 1e-24)
    p2 = vnormalize(vcross(n, p1), 1e-24)
    return p1, p2


def _cosine_hemisphere(n, xi1, xi2):
    up = jnp.sqrt(xi1)
    over = jnp.sqrt(jnp.clip(1.0 - xi1, 0.0, None))
    around = xi2 * TWO_PI
    p1, p2 = _not_axis_frame(n)
    return vadd(
        vscale(up, n),
        vadd(vscale(jnp.cos(around) * over, p1), vscale(jnp.sin(around) * over, p2)),
    )


def _rotate_about(axis_dir, cos_angle, phi):
    sin_angle = jnp.sqrt(jnp.clip(1.0 - cos_angle * cos_angle, 0.0, None))
    p1, p2 = _not_axis_frame(axis_dir)
    return vadd(
        vscale(cos_angle, axis_dir),
        vadd(
            vscale(jnp.cos(phi) * sin_angle, p1),
            vscale(jnp.sin(phi) * sin_angle, p2),
        ),
    )


def _ggx_planes(mat, n, d_in, cos_i, u0, u1):
    """Plane transcription of ops.bsdf.ggx_sample (Cook-Torrance GGX)."""
    alpha = jnp.clip(mat["roughness"] * mat["roughness"], 1e-4, 1.0)
    a2 = alpha * alpha
    xi1 = jnp.clip(u0, 1e-7, 1.0 - 1e-7)
    cos_h = jnp.sqrt(jnp.clip((1.0 - xi1) / (1.0 + (a2 - 1.0) * xi1), 0.0, 1.0))
    h = _rotate_about(n, cos_h, u1 * TWO_PI)
    d = vsub(d_in, vscale(2.0 * vdot(d_in, h), h))
    wo_dot_h = -vdot(d_in, h)
    cos_o = vdot(d, n)
    valid = (cos_o > 0.0) & (wo_dot_h > 0.0)

    def g1(c):
        c = jnp.clip(c, 1e-6, 1.0)
        return 2.0 * c / (c + jnp.sqrt(a2 + (1.0 - a2) * c * c))

    g = g1(jnp.clip(cos_i, 1e-6, 1.0)) * g1(cos_o)
    spec = mat["spec_color"]
    f5 = jnp.clip(1.0 - wo_dot_h, 0.0, None) ** 5
    f = (
        spec[0] + (1.0 - spec[0]) * f5,
        spec[1] + (1.0 - spec[1]) * f5,
        spec[2] + (1.0 - spec[2]) * f5,
    )
    w = g * wo_dot_h / jnp.maximum(jnp.clip(cos_i, 1e-6, 1.0) * cos_h, 1e-6)
    weight = vwhere(valid, vscale(w, f), (0.0 * w,) * 3)
    return d, weight


def _ward_planes(mat, n, d_in, cos_i, u0, u1):
    """Plane transcription of ops.bsdf.ward_sample (Walter 2005)."""
    ax_ = jnp.clip(mat["roughness"], 1e-3, 1.0)
    ay_ = jnp.clip(
        jnp.where(mat["roughness_y"] > 0.0, mat["roughness_y"], mat["roughness"]),
        1e-3, 1.0,
    )
    xi1 = jnp.clip(u0, 1e-7, 1.0 - 1e-7)
    beta = TWO_PI * u1
    cb, sb = jnp.cos(beta), jnp.sin(beta)
    d_inv = ax_ * ax_ * cb * cb + ay_ * ay_ * sb * sb
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(d_inv, 1e-12))
    cos_phi = ax_ * cb * inv_len
    sin_phi = ay_ * sb * inv_len
    tan2 = -jnp.log(xi1) * d_inv
    cos_th = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_th = jnp.sqrt(jnp.clip(1.0 - cos_th * cos_th, 0.0, None))
    t1, t2 = _not_axis_frame(n)
    h = vadd(
        vscale(cos_th, n),
        vadd(vscale(sin_th * cos_phi, t1), vscale(sin_th * sin_phi, t2)),
    )
    d = vsub(d_in, vscale(2.0 * vdot(d_in, h), h))
    wi_dot_h = -vdot(d_in, h)
    cos_o = vdot(d, n)
    valid = (cos_o > 0.0) & (wi_dot_h > 0.0)
    w = (
        wi_dot_h
        * cos_th**3
        * jnp.sqrt(jnp.clip(cos_o, 0.0, None) / jnp.clip(cos_i, 1e-6, 1.0))
    )
    weight = vwhere(valid, vscale(w, mat["spec_color"]), (0.0 * w,) * 3)
    return d, weight


def _sample_bsdf_planes(mat, p, n_raw, d_in, u0, u1, u2, features=frozenset()):
    """Plane transcription of ops.bsdf.sample_bsdf.  ``features`` is the
    static RenderConfig.features gate: the Cook-Torrance/Ward lobes only
    enter the graph when enabled (same contract as the split path)."""
    cos_raw = vdot(d_in, n_raw)
    entering = cos_raw < 0.0
    n = vwhere(entering, n_raw, vscale(jnp.float32(-1.0), n_raw))
    cos_i = jnp.abs(cos_raw)

    d_diffuse = _cosine_hemisphere(n, u0, u1)
    d_mirror = vsub(d_in, vscale(2.0 * vdot(d_in, n), n))

    exp_n = jnp.maximum(mat["spec_exp"], 1e-6)
    cos_alpha = jnp.exp(jnp.log(jnp.clip(u0, 1e-9, None)) / (exp_n + 1.0))
    d_glossy = _rotate_about(d_mirror, cos_alpha, u1 * TWO_PI)
    glossy_cos_out = vdot(d_glossy, n)
    glossy_weight = jnp.where(
        glossy_cos_out > 0.0,
        (exp_n + 2.0) / (exp_n + 1.0) * jnp.clip(glossy_cos_out, 0.0, 1.0),
        0.0,
    )

    ior_i = jnp.where(entering, 1.0, mat["ior"])
    ior_t = jnp.where(entering, mat["ior"], 1.0)
    eta = ior_i / jnp.maximum(ior_t, 1e-6)
    # refract (ops.bsdf.refract)
    r_cos_i = -vdot(d_in, n)
    sin2_t = eta * eta * jnp.clip(1.0 - r_cos_i * r_cos_i, 0.0, None)
    refr_valid = sin2_t <= 1.0
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 1e-12, None))
    d_refr = vnormalize(
        vadd(vscale(eta, d_in), vscale(eta * r_cos_i - cos_t, n)), 1e-24
    )
    # fresnel_dielectric
    f_cos_i = jnp.clip(cos_i, 0.0, 1.0)
    f_sin2t = eta * eta * (1.0 - f_cos_i * f_cos_i)
    tir = f_sin2t > 1.0
    f_cos_t = jnp.sqrt(jnp.clip(1.0 - f_sin2t, 1e-12, None))
    r_par = (ior_t * f_cos_i - ior_i * f_cos_t) / (ior_t * f_cos_i + ior_i * f_cos_t)
    r_perp = (ior_i * f_cos_i - ior_t * f_cos_t) / (ior_i * f_cos_i + ior_t * f_cos_t)
    fres_r = jnp.where(tir, 1.0, 0.5 * (r_par * r_par + r_perp * r_perp))
    fres_r = jnp.where(refr_valid, fres_r, 1.0)
    choose_reflect = u2 < fres_r
    d_dielectric = vwhere(choose_reflect, d_mirror, d_refr)

    is_refractive = mat["has_refractive"] > 0.0
    is_reflective = (~is_refractive) & (mat["has_reflective"] > 0.0)
    if "microfacet" in features:
        # microfacet family: 1 = Cook-Torrance GGX, 2 = Ward anisotropic
        # — both ride the is_ct lane (ops/bsdf.sample_bsdf lobe order)
        is_ct = is_reflective & (mat["brdf_model"] > 0.5)
        d_ct, ct_weight = _ggx_planes(mat, n, d_in, cos_i, u0, u1)
        if "ward" in features:
            is_ward = mat["brdf_model"] > 1.5
            d_wd, wd_weight = _ward_planes(mat, n, d_in, cos_i, u0, u1)
            d_ct = vwhere(is_ward, d_wd, d_ct)
            ct_weight = vwhere(is_ward, wd_weight, ct_weight)
    else:
        is_ct = jnp.zeros(cos_i.shape, bool)
    is_glossy = is_reflective & (mat["spec_exp"] > 0.0) & (~is_ct)
    is_mirror = is_reflective & (~is_glossy) & (~is_ct)
    is_specular = is_refractive | is_reflective

    direction = vwhere(
        is_refractive,
        d_dielectric,
        vwhere(is_glossy, d_glossy, vwhere(is_mirror, d_mirror, d_diffuse)),
    )
    if "microfacet" in features:
        direction = vwhere(
            is_refractive, d_dielectric, vwhere(is_ct, d_ct, direction)
        )
    thr = vwhere(is_specular, mat["spec_color"], mat["color"])
    thr = vwhere(is_glossy, vscale(glossy_weight, thr), thr)
    if "microfacet" in features:
        thr = vwhere(is_ct, ct_weight, thr)
    transmitted = is_refractive & (~choose_reflect) & refr_valid
    bias = jnp.where(transmitted, -RAY_BIAS, RAY_BIAS)
    origin = vadd(p, vscale(bias, n))
    return dict(
        direction=direction,
        origin=origin,
        throughput_mult=thr,
        is_specular=is_specular,
        transmitted=transmitted,
        entering=entering,
    )


def _sample_lights_planes(lvals, svals, u0, u1, u2, u3):
    """Plane transcription of ops.lights.sample_lights (point candidates;
    the caller resolves sphere-vs-cube with the picked light's type flag).

    ``lvals`` row (VALUES, ``[G][19]``): fwd m00..m23 (0:12), light-pick
    cdf (12), emit rgb (13:16), world per-axis scales (16:19); ``svals``:
    [total light area, any-light flag]."""
    n_geoms = len(lvals)
    total_area = svals[0]
    valid = svals[1] > 0.5

    # inverse-CDF pick: light_id = sum(u0 > cdf_g)
    lid = jnp.zeros(u0.shape, jnp.int32)
    for g in range(n_geoms):
        lid = lid + (u0 > lvals[g][12]).astype(jnp.int32)
    lid = jnp.clip(lid, 0, n_geoms - 1)

    # select the picked light's rows (fwd transform, emit color, scales)
    fwd = [jnp.zeros(u0.shape, jnp.float32) for _ in range(12)]
    emit = [jnp.zeros(u0.shape, jnp.float32) for _ in range(3)]
    scl = [jnp.zeros(u0.shape, jnp.float32) for _ in range(3)]
    for g in range(n_geoms):
        sel = lid == g
        for k in range(12):
            fwd[k] = jnp.where(sel, lvals[g][k], fwd[k])
        for k in range(3):
            emit[k] = jnp.where(sel, lvals[g][13 + k], emit[k])
            scl[k] = jnp.where(sel, lvals[g][16 + k], scl[k])
    sx, sy, sz = scl

    # cube face-pair pick by world area (lights._sample_unit_cube_surface)
    fa = (2.0 * sy * sz, 2.0 * sx * sz, 2.0 * sx * sy)
    ftot = jnp.maximum(fa[0] + fa[1] + fa[2], 1e-20)
    c0 = fa[0] / ftot
    c1 = (fa[0] + fa[1]) / ftot
    axis = (u1 > c0).astype(jnp.int32) + (u1 > c1).astype(jnp.int32)
    side = jnp.where(u2 < 0.5, -0.5, 0.5)
    cc1 = jnp.where(u2 < 0.5, u2 * 2.0, (u2 - 0.5) * 2.0) - 0.5
    cc2 = u3 - 0.5
    ax0 = axis == 0
    ax1 = axis == 1
    ax2 = axis == 2
    # components for the (axis, axis+1, axis+2) slot placement
    px = jnp.where(ax0, side, jnp.where(ax1, cc2, cc1))
    py = jnp.where(ax1, side, jnp.where(ax2, cc2, cc1))
    pz = jnp.where(ax2, side, jnp.where(ax0, cc2, cc1))
    sgn = jnp.sign(side)
    n_cube = (
        jnp.where(ax0, sgn, 0.0),
        jnp.where(ax1, sgn, 0.0),
        jnp.where(ax2, sgn, 0.0),
    )

    # sphere sample (lights._sample_unit_sphere_surface, u2/u3 slots)
    z = 1.0 - 2.0 * u2
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, None))
    phi = TWO_PI * u3
    n_s = (r * jnp.cos(phi), r * jnp.sin(phi), z)

    return dict(
        lid=lid, fwd=fwd, emit=emit,
        total_area=total_area, valid=valid,
        sphere_parts=(n_s,), cube_parts=((px, py, pz), n_cube),
    )


# ---------------------------------------------------------------------------
# the physics (pure function of plane + table VALUES)
# ---------------------------------------------------------------------------

def read_gvals(gdata_ref, n_geoms):
    """SMEM geom table -> ``[G][14]`` scalar values."""
    return [[gdata_ref[g, k] for k in range(14)] for g in range(n_geoms)]


def read_mvals(mat_ref, n_materials):
    return [[mat_ref[m, k] for k in range(MAT_FIELDS)] for m in range(n_materials)]


def read_lvals(ldata_ref, n_geoms):
    return [[ldata_ref[g, k] for k in range(19)] for g in range(n_geoms)]


def bounce_physics(
    o, d, throughput, sigma_a, sigma_s,
    gvals, mvals, lvals, svals,
    u, depth, prev_state,
    mesh_in=None,
    medium_g=None,
    *, nee: bool, t_min: float, features: frozenset = frozenset(),
    tex_defer: bool = False, vol_nee: bool = True,
    mesh_hit_fn=None, mesh_occ_fn=None, mesh_occ_split_fn=None,
    replay=None, emit_replay: bool = False,
):
    """The ENTIRE per-bounce physics as a pure function of component
    planes and table scalar values — render/common.py's shade_bounce
    transcribed plane-for-plane (the test suite pins them equal).

    Shared between the forward kernel (:func:`_bounce_kernel` reads refs,
    calls this, stores refs) and the backward kernel
    (ops/bounce_grad.py takes ``jax.vjp`` of this very function inside
    the kernel), so forward and backward can never drift apart.

    Differentiable in ``o, d, throughput, sigma_a, sigma_s`` and every
    table scalar; ``u, depth, prev_state, mesh_in`` are non-differentiable
    (RNG / discrete).  The winner where-chain routes cotangents to the
    winning geom only — exactly the gradient-lean semantics of
    ops/intersect.intersect_scene_lean.

    ``prev_state`` is the carried float emit-state plane (0 / 1 / 2 —
    render/common.BounceResult.was_specular).  ``features`` is the
    static RenderConfig.features gate: the
    Cook-Torrance/Ward lobes ("microfacet"/"ward") and the
    Henyey-Greenstein phase ("hg") only enter the graph when listed —
    the same contract as the split path's sample_bsdf flags.  With "hg",
    pass ``medium_g`` (the carried phase-g plane); the result then also
    has ``out_mg``.

    Returns a dict: contrib(3), next_o(3), next_d(3), thr_mult(3),
    terminate, wspec (bools), rru, out_ma(3), out_ms [, out_mg], and —
    when ``mesh_in`` is given under NEE — ``nee_deferred`` (the shadow
    ray + pending NEE term for the wrapper's triangle-occlusion test).

    ``mesh_hit_fn`` / ``mesh_occ_fn`` (r5, kernel-side only): zero-arg /
    ``(x, wi)`` closures built over the in-kernel SMEM triangle tables
    (:func:`mesh_sweep_planes` / :func:`mesh_occ_planes`).  With
    ``mesh_hit_fn``, the mesh winner is computed INSIDE the kernel
    (mesh_in must be None); with ``mesh_occ_fn``, the NEE shadow ray
    tests triangles in-kernel too and nothing is deferred.  Neither is
    passed under ``jax.vjp`` (the fused backward excludes meshes).

    **Winner replay** (r5, the fwd+bwd speed work): with
    ``emit_replay=True`` the result also carries ``replay_gid`` (winner
    geom id as float, -1 = miss) and ``replay_nee_add`` (the resolved
    NEE candidate&visible bit).  The backward kernel feeds them back via
    ``replay=``: the argmin sweep collapses to a one-hot winner
    recompute and the NEE occlusion sweep is skipped outright.  Both
    replays are gradient-exact: the discrete winner choice and the
    visibility bit are comparisons (zero cotangent — the same detached
    semantics the where-chain/boolean already had), and the replayed
    winner recompute produces bit-identical values on every lane whose
    output cotangents are nonzero."""
    n_geoms = len(gvals)
    assert replay is None or (mesh_in is None and mesh_hit_fn is None)
    if mesh_hit_fn is not None:
        assert mesh_in is None
        mesh_in = mesh_hit_fn()
    mesh_merge = mesh_in is not None

    # ---- nearest hit (same unrolled pass as _nearest_hit_kernel)
    if replay is not None:
        # winner replay: the forward already resolved the argmin — select
        # the winner's 14 table scalars per lane (one-hot chain) and
        # recompute ONLY its intersection.  Bit-identical to the sweep on
        # hit lanes (select-then-multiply == multiply-then-select), and
        # miss lanes (replay gid < 0) only feed outputs whose cotangents
        # the scan masks to zero.
        rhit = replay["gid"] >= 0.0
        gid = jnp.maximum(replay["gid"], 0.0).astype(jnp.int32)
        gv = [jnp.zeros(o[0].shape, jnp.float32) for _ in range(14)]
        for g in range(n_geoms):
            selg = gid == g
            for k in range(14):
                gv[k] = jnp.where(selg, gvals[g][k], gv[k])
        t_win, obj = _geom_t(gv, *o, *d, t_min)
        best_t = jnp.where(rhit, t_win, BIG)
        mid = jnp.where(rhit, gv[13].astype(jnp.int32), 0)
        is_sphere = jnp.where(rhit & (gv[12] == float(SPHERE)), 1.0, 0.0)
        w = [jnp.where(rhit, ob, 0.0) for ob in obj]
        gv_win = gv
    else:
        best_t = jnp.full(o[0].shape, BIG, jnp.float32)
        gid = jnp.zeros(o[0].shape, jnp.int32)
        mid = jnp.zeros(o[0].shape, jnp.int32)
        is_sphere = jnp.zeros(o[0].shape, jnp.float32)
        w = [jnp.zeros(o[0].shape, jnp.float32) for _ in range(6)]
        for g in range(n_geoms):
            t_g, obj = _geom_t(gvals[g], *o, *d, t_min)
            better = t_g < best_t
            sph_flag = jnp.where(gvals[g][12] == float(SPHERE), 1.0, 0.0)
            best_t = jnp.where(better, t_g, best_t)
            gid = jnp.where(better, g, gid)
            mid = jnp.where(better, gvals[g][13].astype(jnp.int32), mid)
            is_sphere = jnp.where(better, sph_flag, is_sphere)
            w = [jnp.where(better, ob, prev) for ob, prev in zip(obj, w)]
        gv_win = None
    hit = best_t < BIG
    t_safe = jnp.where(hit, best_t, 1.0)
    p = vadd(o, vscale(t_safe, d))
    p_obj = (w[0] + t_safe * w[3], w[1] + t_safe * w[4], w[2] + t_safe * w[5])

    axx, axy, axz = jnp.abs(p_obj[0]), jnp.abs(p_obj[1]), jnp.abs(p_obj[2])
    fx = (axx >= axy) & (axx >= axz)
    fy = (~fx) & (axy >= axz)
    inv_len = jax.lax.rsqrt(jnp.maximum(vdot(p_obj, p_obj), 1e-24))
    sph = is_sphere > 0.5
    n_obj = (
        jnp.where(sph, p_obj[0] * inv_len, jnp.where(fx, jnp.sign(p_obj[0]), 0.0)),
        jnp.where(sph, p_obj[1] * inv_len, jnp.where(fy, jnp.sign(p_obj[1]), 0.0)),
        jnp.where(
            sph, p_obj[2] * inv_len,
            jnp.where((~fx) & (~fy), jnp.sign(p_obj[2]), 0.0),
        ),
    )
    if gv_win is not None:
        # replay: the winner's inverse-transform rows are already
        # selected per lane — transform the normal directly (same values
        # as the select-per-geom chain below)
        m = gv_win
        nw = [
            m[0] * n_obj[0] + m[4] * n_obj[1] + m[8] * n_obj[2],
            m[1] * n_obj[0] + m[5] * n_obj[1] + m[9] * n_obj[2],
            m[2] * n_obj[0] + m[6] * n_obj[1] + m[10] * n_obj[2],
        ]
    else:
        nw = [jnp.zeros(o[0].shape, jnp.float32) for _ in range(3)]
        for g in range(n_geoms):
            sel = gid == g
            m = gvals[g]
            nw[0] = jnp.where(sel, m[0] * n_obj[0] + m[4] * n_obj[1] + m[8] * n_obj[2], nw[0])
            nw[1] = jnp.where(sel, m[1] * n_obj[0] + m[5] * n_obj[1] + m[9] * n_obj[2], nw[1])
            nw[2] = jnp.where(sel, m[2] * n_obj[0] + m[6] * n_obj[1] + m[10] * n_obj[2], nw[2])
    normal = vnormalize(tuple(nw), 1e-24)

    # ---- mesh-winner merge: the nearest-triangle hit across the scene's
    # MESH instances is computed OUTSIDE the kernel (XLA chunked-LBVH
    # traversal, ops/intersect.mesh_only_hit) and merged into the analytic
    # winner here — triangles stream through the accel scan once, the
    # shading stays fully fused.
    if mesh_merge:
        et = mesh_in["et"]
        mb = et < best_t
        best_t = jnp.where(mb, et, best_t)
        mid = jnp.where(mb, mesh_in["emid"], mid)
        hit = best_t < BIG
        t_safe = jnp.where(hit, best_t, 1.0)
        p = vadd(o, vscale(t_safe, d))
        p_obj = vwhere(mb, mesh_in["epo"], p_obj)
        normal = vwhere(mb, mesh_in["en"], normal)

    # ---- material fetch
    mat = _material_fetch(mvals, mid)
    emissive = mat["emittance"] > 0.0

    # Feature gates (r5): the texture / bump / volumetric blocks used to
    # run unconditionally ("the monolith"); with the trimmed features of
    # a plain scene (e.g. cornell resolves to ()) they are numeric
    # no-ops that still cost VPU flops — and ~3x that in the vjp kernel.
    # The gates mirror render/common.py's exactly, so the fused kernels,
    # the split path, and the lean backward all model the same physics
    # for a given cfg.features.
    has_tex = "texture" in features
    has_bump = "bump" in features
    has_vol = "volumetric" in features  # same gate as render/common.py
    # ("hg" without "volumetric" is inert there too)

    # ---- procedural texture (render/common.py texture block).  The
    # < 2.5 bound excludes image-textured materials (type 3), whose
    # albedo modulation is DEFERRED to the wrapper (tex_defer): albedo
    # enters contrib and the diffuse throughput strictly linearly, so
    # the wrapper can multiply the bilinear atlas texel in afterwards —
    # the atlas gather stays outside the kernel.
    if has_tex:
        cells = (
            jnp.floor(p_obj[0] * mat["texture_scale"]),
            jnp.floor(p_obj[1] * mat["texture_scale"]),
            jnp.floor(p_obj[2] * mat["texture_scale"]),
        )
        checker = jnp.mod(cells[0] + cells[1] + cells[2], 2.0)
        stripes = jnp.mod(cells[0], 2.0)
        pattern = jnp.where(mat["texture_type"] > 1.5, stripes, checker)
        textured = (
            (mat["texture_type"] > 0.5)
            & (mat["texture_type"] < 2.5)
            & (pattern > 0.5)
        )
        mat["color"] = vwhere(textured, mat["texture_color2"], mat["color"])

    tex_out = None
    if tex_defer:
        # ---- UV for the deferred image-texture fetch (ops/texture.py
        # compute_uv, on planes).  Sphere: longitude/latitude of the
        # r=0.5 object point; cube: face-local planar map (dominant
        # |p_obj| axis); mesh: box map (dominant |n_obj| axis, with the
        # object normal recovered as M^T n_world via the winner's
        # FORWARD transform rows, which ride in the light table).
        u_sph = _atan2_planes(p_obj[2], p_obj[0]) * (1.0 / TWO_PI) + 0.5
        v_sph = (
            _asin_planes(jnp.clip(p_obj[1] * 2.0, -1.0, 1.0)) * INV_PI + 0.5
        )
        if mesh_merge:
            fwd = [jnp.zeros(o[0].shape, jnp.float32) for _ in range(12)]
            for g in range(n_geoms):
                selg = gid == g
                for k in range(12):
                    fwd[k] = jnp.where(selg, lvals[g][k], fwd[k])
            # n_obj = M^T n_world (rows of the forward transform)
            ntx = fwd[0] * normal[0] + fwd[4] * normal[1] + fwd[8] * normal[2]
            nty = fwd[1] * normal[0] + fwd[5] * normal[1] + fwd[9] * normal[2]
            ntz = fwd[2] * normal[0] + fwd[6] * normal[1] + fwd[10] * normal[2]
            sel_src = vwhere(mb, (jnp.abs(ntx), jnp.abs(nty), jnp.abs(ntz)),
                             (jnp.abs(p_obj[0]), jnp.abs(p_obj[1]), jnp.abs(p_obj[2])))
        else:
            sel_src = (jnp.abs(p_obj[0]), jnp.abs(p_obj[1]), jnp.abs(p_obj[2]))
        ax0 = (sel_src[0] >= sel_src[1]) & (sel_src[0] >= sel_src[2])
        ax1 = (~ax0) & (sel_src[1] >= sel_src[2])
        ax2 = (~ax0) & (~ax1)
        u_box = jnp.where(ax0, p_obj[2], p_obj[0]) + 0.5
        v_box = jnp.where(ax2, p_obj[1], jnp.where(ax0, p_obj[1], p_obj[2])) + 0.5
        uv_u = jnp.where(sph, u_sph, u_box)
        uv_v = jnp.where(sph, v_sph, v_box)
        if mesh_merge and mesh_in.get("muvv") is not None:
            # authored OBJ vt coordinates win on mesh lanes that have them
            use_auth = mb & (mesh_in["muvv"] > 0.5)
            uv_u = jnp.where(use_auth, mesh_in["muv_u"], uv_u)
            uv_v = jnp.where(use_auth, mesh_in["muv_v"], uv_v)
        is_img = (mat["texture_type"] > 2.5) & hit
        tex_out = dict(
            u=uv_u * mat["texture_scale"],
            v=uv_v * mat["texture_scale"],
            slot=jnp.where(is_img, mat["texture_image"], -1.0),
        )

    # ---- procedural bump (render/common.py bump block)
    if has_bump:
        bump_on = mat["bump_scale"] > 0.0
        t1, t2 = _not_axis_frame(normal)
        ph1 = p_obj[0] * 12.9898 + p_obj[1] * 78.233 + p_obj[2] * 37.719
        ph2 = p_obj[0] * 93.989 + p_obj[1] * 26.651 + p_obj[2] * 61.312
        amp = jnp.where(bump_on, mat["bump_amp"], 0.0)
        n_bumped = vnormalize(
            vadd(
                normal,
                vadd(
                    vscale(amp * jnp.sin(mat["bump_scale"] * ph1), t1),
                    vscale(amp * jnp.sin(mat["bump_scale"] * ph2), t2),
                ),
            ),
            1e-24,
        )
        normal = vwhere(bump_on, n_bumped, normal)

    # ---- volumetric free path (render/common.py).  Gated off: vacuum
    # transport — exactly what zero sigmas compute, minus the exp/log
    # ops and (in the vjp kernel) their transposes.
    if has_vol:
        free_path = jnp.where(
            sigma_s > 0.0,
            -jnp.log(jnp.clip(1.0 - u[8], 1e-7, 1.0))
            / jnp.maximum(sigma_s, 1e-12),
            jnp.float32(1e30),
        )
        vol_scatter = hit & (free_path < best_t)
        if tex_out is not None:
            # a lane that scatters in-medium BEFORE its image-textured
            # winner has no surface event this bounce: its contrib is the
            # volumetric NEE term, which the split path never
            # texel-modulates.  Retract the deferred slot so the
            # wrapper's texel multiply is a no-op (ADVICE r4: is_img must
            # be gated on ~vol_scatter).
            tex_out["slot"] = jnp.where(vol_scatter, -1.0, tex_out["slot"])
        seg = jnp.where(vol_scatter, free_path, jnp.where(hit, best_t, 0.0))
        atten = (
            jnp.exp(-sigma_a[0] * seg),
            jnp.exp(-sigma_a[1] * seg),
            jnp.exp(-sigma_a[2] * seg),
        )
        throughput = vmul(throughput, atten)
        not_vs = ~vol_scatter
    else:
        vol_scatter = not_vs = None  # all surface events (early return below)

    # ---- emittance on BSDF hit (3-state emit code — see
    # render/common.BounceResult.was_specular: only state 1 counts)
    emitted = vscale(mat["emittance"], vmul(throughput, mat["color"]))
    emit_mask = hit & emissive & not_vs if has_vol else (hit & emissive)
    if nee:
        emit_mask = emit_mask & (
            (depth == 0) | (jnp.abs(prev_state - 1.0) < 0.5)
        )
    zero3 = (0.0 * o[0], 0.0 * o[0], 0.0 * o[0])
    contrib = vwhere(emit_mask, emitted, zero3)

    # ---- BSDF continuation
    sc = _sample_bsdf_planes(
        mat, p, normal, d, u[0], u[1], u[2], features=features
    )

    # ---- NEE
    nee_deferred = add = None
    if nee:
        ls = _sample_lights_planes(lvals, svals, u[4], u[5], u[6], u[7])
        # resolve the sphere/cube pick with the picked light's type flag
        # (float flag plane — Mosaic has no i1 vector storage)
        lid = ls["lid"]
        l_sph_f = jnp.zeros(o[0].shape, jnp.float32)
        for g in range(n_geoms):
            flag = jnp.where(gvals[g][12] == float(SPHERE), 1.0, 0.0)
            l_sph_f = jnp.where(lid == g, flag, l_sph_f)
        l_is_sph = l_sph_f > 0.5
        (n_s,) = ls["sphere_parts"]
        (p_cube, n_cube) = ls["cube_parts"]
        lp_obj = vwhere(l_is_sph, vscale(jnp.float32(0.5), n_s), p_cube)
        ln_obj = vwhere(l_is_sph, n_s, n_cube)
        f = ls["fwd"]
        lp = (
            f[0] * lp_obj[0] + f[1] * lp_obj[1] + f[2] * lp_obj[2] + f[3],
            f[4] * lp_obj[0] + f[5] * lp_obj[1] + f[6] * lp_obj[2] + f[7],
            f[8] * lp_obj[0] + f[9] * lp_obj[1] + f[10] * lp_obj[2] + f[11],
        )
        # light normal: inverse-transpose of the picked light
        li = [jnp.zeros(o[0].shape, jnp.float32) for _ in range(12)]
        for g in range(n_geoms):
            sel = lid == g
            for k in range(12):
                li[k] = jnp.where(sel, gvals[g][k], li[k])
        ln = vnormalize(
            (
                li[0] * ln_obj[0] + li[4] * ln_obj[1] + li[8] * ln_obj[2],
                li[1] * ln_obj[0] + li[5] * ln_obj[1] + li[9] * ln_obj[2],
                li[2] * ln_obj[0] + li[6] * ln_obj[1] + li[10] * ln_obj[2],
            ),
            1e-24,
        )

        n_shade = vscale(jnp.sign(-vdot(normal, d)), normal)
        x = vadd(p, vscale(jnp.float32(RAY_BIAS), n_shade))
        to_light = vsub(lp, x)
        dist2 = vdot(to_light, to_light)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        wi = vscale(1.0 / dist, to_light)
        cos_x = vdot(n_shade, wi)
        cos_y = -vdot(ln, wi)
        if replay is not None:
            # visibility replay: candidate & visible was resolved by the
            # forward — both are pure comparisons (zero cotangent), so
            # feeding the bit back skips the whole occlusion sweep with
            # identical gradients
            candidate = visible = None
        else:
            diffuse_lane = hit & (~emissive) & (~sc["is_specular"])
            if has_vol:
                diffuse_lane = diffuse_lane & not_vs
            candidate = diffuse_lane & ls["valid"] & (cos_x > 0) & (cos_y > 0)

            # shadow occlusion vs the analytic geoms: second unrolled geom
            # loop.  Visibility is boolean — comparisons carry no cotangent,
            # so under jax.vjp this sweep transposes to nothing (the
            # grad-lean detached-occlusion semantics for free).
            occ_t = jnp.full(o[0].shape, BIG, jnp.float32)
            for g in range(n_geoms):
                t_g, _ = _geom_t(gvals[g], *x, *wi, t_min)
                occ_t = jnp.minimum(occ_t, t_g)
            if mesh_occ_fn is not None:
                # in-kernel triangle occlusion: the shadow ray sweeps the
                # SMEM triangle tables too — nothing left to defer
                occ_t = jnp.minimum(occ_t, mesh_occ_fn(x, wi))
            visible = occ_t >= dist - 4.0 * RAY_BIAS

        gterm = cos_x * cos_y / jnp.maximum(dist2, 1e-12)
        pdf_area = 1.0 / jnp.maximum(ls["total_area"], 1e-20)
        nee_scale = gterm / jnp.maximum(pdf_area, 1e-20) * INV_PI
        nee_rgb = vscale(
            nee_scale, vmul(vmul(throughput, mat["color"]), tuple(ls["emit"]))
        )
        if mesh_merge and mesh_occ_fn is None:
            # triangle occlusion of the in-kernel shadow ray can't be
            # tested here — emit the shadow ray + pending NEE term; the
            # wrapper tests mesh occlusion (XLA accel) and adds it in.
            # min(analytic_t, mesh_t) >= thresh == (analytic vis) & (mesh
            # vis), so splitting the test is exact.
            nee_deferred = dict(
                x=x, wi=wi, dist=dist, nee_rgb=nee_rgb,
                cand_vis=jnp.where(candidate & visible, 1.0, 0.0),
            )
            add = None
        else:
            add = (
                replay["nee_add"] > 0.5
                if replay is not None
                else candidate & visible
            )
            contrib = vadd(contrib, vwhere(add, nee_rgb, zero3))

    # surface emit-state: specular continues a suppressed chain
    surf_state = jnp.where(
        sc["is_specular"],
        jnp.where(jnp.abs(prev_state - 2.0) < 0.5, 2.0, 1.0),
        0.0,
    )

    replay_out = None
    if emit_replay:
        replay_out = dict(
            replay_gid=jnp.where(hit, gid.astype(jnp.float32), -1.0),
            replay_nee_add=(
                jnp.where(add, 1.0, 0.0)
                if (nee and add is not None)
                else 0.0 * o[0]
            ),
        )

    if not has_vol:
        # vacuum transport: surface events only (render/common.py's
        # early return for feature-gated-off volumetrics — the medium
        # state passes through untouched)
        out = dict(
            contrib=contrib,
            next_o=sc["origin"],
            next_d=sc["direction"],
            thr_mult=sc["throughput_mult"],
            terminate=(~hit) | emissive,
            wspec=surf_state,
            rru=u[3],
            out_ma=sigma_a,
            out_ms=sigma_s,
            nee_deferred=nee_deferred,
            tex_out=tex_out,
        )
        if medium_g is not None:
            out["out_mg"] = medium_g
        if replay_out is not None:
            out.update(replay_out)
        return out

    # ---- in-medium scatter (render/common.py tail)
    vol_pos = vadd(o, vscale(free_path, d))
    vz = 1.0 - 2.0 * u[9]
    vr = jnp.sqrt(jnp.clip(1.0 - vz * vz, 0.0, None))
    vphi = TWO_PI * u[10]
    vol_dir = (vr * jnp.cos(vphi), vr * jnp.sin(vphi), vz)
    if "hg" in features:
        # Henyey-Greenstein phase about the propagation direction
        # (ops/bsdf.henyey_greenstein), selected PER LANE against the
        # uniform-sphere sample so g == 0 lanes stay bit-exact with the
        # feature off (render/common.py; ADVICE r3)
        g_c = jnp.clip(medium_g, -0.999, 0.999)
        near0 = jnp.abs(g_c) < 1e-3
        safe_g = jnp.where(near0, 1.0, g_c)
        frac = (1.0 - g_c * g_c) / (1.0 - g_c + 2.0 * g_c * u[9])
        cos_hg = (1.0 + g_c * g_c - frac * frac) / (2.0 * safe_g)
        cos_t = jnp.clip(jnp.where(near0, 1.0 - 2.0 * u[9], cos_hg), -1.0, 1.0)
        sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t * cos_t, 0.0, None))
        hg_phi = TWO_PI * u[10]
        t1h, t2h = _not_axis_frame(d)
        hg_dir = vadd(
            vscale(cos_t, d),
            vadd(
                vscale(sin_t * jnp.cos(hg_phi), t1h),
                vscale(sin_t * jnp.sin(hg_phi), t2h),
            ),
        )
        vol_dir = vwhere(medium_g != 0.0, hg_dir, vol_dir)

    # ---- volumetric NEE (render/common.py): direct light at the
    # scatter point, phase-weighted, straight-line transmittance;
    # refractive interfaces bound the attenuated segment but do not
    # block.  Mesh scenes participate when their triangle occlusion
    # (refractive/opaque split) runs in-kernel (mesh_occ_split_fn);
    # merge-plane mesh scenes take the split path (render/common.py).
    vol_state = jnp.full(o[0].shape, 1.0, jnp.float32)
    if nee and vol_nee and (not mesh_merge or mesh_occ_split_fn is not None):
        n_materials = len(mvals)
        # a lane that did NOT scatter has free_path ~1e30, so vol_pos is
        # ~1e30 — squaring it in the occlusion recompute overflows to
        # inf and inf-inf NaNs poison the vjp even under the cand_v mask
        # (0 x NaN = NaN in the transpose).  Use the (finite) ray origin
        # on those lanes: their contribution is masked off, and scatter
        # lanes are bit-unchanged.
        vp = vwhere(vol_scatter, vol_pos, o)
        to_l = vsub(lp, vp)
        d2v = vdot(to_l, to_l)
        distv = jnp.sqrt(jnp.maximum(d2v, 1e-12))
        wiv = vscale(1.0 / distv, to_l)
        cos_yv = -vdot(ln, wiv)
        cand_v = vol_scatter & ls["valid"] & (cos_yv > 0)

        # occlusion split: DETACHED, exactly like the split path
        # (render/common.py stop_gradients the shadow ray, the geoms,
        # and both t outputs) — visibility is discrete and the boundary
        # distance is treated as a constant of the transmittance
        sg = jax.lax.stop_gradient
        vp_sg = (sg(vp[0]), sg(vp[1]), sg(vp[2]))
        wiv_sg = (sg(wiv[0]), sg(wiv[1]), sg(wiv[2]))
        # per-geom refractive flag (scalar select over materials)
        occ_op = jnp.full(o[0].shape, BIG, jnp.float32)
        occ_re = jnp.full(o[0].shape, BIG, jnp.float32)
        for g in range(n_geoms):
            refr_g = jnp.float32(0.0)
            for m in range(n_materials):
                refr_g = jnp.where(
                    gvals[g][13].astype(jnp.int32) == m, mvals[m][7], refr_g
                )
            t_g, _ = _geom_t(
                [sg(v) for v in gvals[g]], *vp_sg, *wiv_sg, t_min
            )
            occ_op = jnp.minimum(occ_op, jnp.where(refr_g > 0.0, BIG, t_g))
            occ_re = jnp.minimum(occ_re, jnp.where(refr_g > 0.0, t_g, BIG))
        if mesh_occ_split_fn is not None:
            m_op, m_re = mesh_occ_split_fn(vp_sg, wiv_sg)
            occ_op = jnp.minimum(occ_op, m_op)
            occ_re = jnp.minimum(occ_re, m_re)
        visible_v = sg(occ_op) >= sg(distv) - 4.0 * RAY_BIAS
        seg_v = jnp.minimum(sg(occ_re), distv)
        transmit = (
            jnp.exp(-(sigma_a[0] + sigma_s) * seg_v),
            jnp.exp(-(sigma_a[1] + sigma_s) * seg_v),
            jnp.exp(-(sigma_a[2] + sigma_s) * seg_v),
        )
        cos_th = vdot(d, wiv)
        if "hg" in features:
            g_c = jnp.clip(medium_g, -0.999, 0.999)
            denomp = jnp.maximum(1.0 + g_c * g_c - 2.0 * g_c * cos_th, 1e-6)
            phase = (1.0 - g_c * g_c) / (
                (4.0 * jnp.float32(math.pi)) * denomp * jnp.sqrt(denomp)
            )
        else:
            phase = jnp.full(cos_th.shape, 1.0 / (4.0 * math.pi), jnp.float32)
        pdf_area_v = 1.0 / jnp.maximum(ls["total_area"], 1e-20)
        scale_v = phase * cos_yv / jnp.maximum(d2v, 1e-12) / jnp.maximum(
            pdf_area_v, 1e-20
        )
        vol_nee = vscale(
            scale_v, vmul(vmul(throughput, transmit), tuple(ls["emit"]))
        )
        add_v = cand_v & visible_v
        contrib = vadd(contrib, vwhere(add_v, vol_nee, zero3))
        vol_state = jnp.where(add_v, 2.0, 1.0)

    terminate = (~hit) | (emissive & (~vol_scatter))
    surf_a = vwhere(
        sc["transmitted"],
        vwhere(sc["entering"], mat["absorption"], (0.0 * o[0],) * 3),
        sigma_a,
    )
    surf_s = jnp.where(
        sc["transmitted"],
        jnp.where(sc["entering"], mat["has_scatter"] * mat["scatter_coeff"], 0.0),
        sigma_s,
    )

    next_o = vwhere(vol_scatter, vol_pos, sc["origin"])
    next_d = vwhere(vol_scatter, vol_dir, sc["direction"])
    thr_mult = vwhere(vol_scatter, atten, vmul(atten, sc["throughput_mult"]))
    out_ma = vwhere(vol_scatter, sigma_a, surf_a)
    out_ms = jnp.where(vol_scatter, sigma_s, surf_s)

    out = dict(
        contrib=contrib,
        next_o=next_o,
        next_d=next_d,
        thr_mult=thr_mult,
        terminate=terminate,
        wspec=jnp.where(vol_scatter, vol_state, surf_state),
        rru=u[3],
        out_ma=out_ma,
        out_ms=out_ms,
        nee_deferred=nee_deferred,
        tex_out=tex_out,
    )
    if medium_g is not None:
        # the carried HG g: entering a SCATTER medium adopts the
        # material's PHASE g, exiting resets, in-medium scatter keeps it
        # (render/common.py surf_medium tail)
        surf_g = jnp.where(
            sc["transmitted"],
            jnp.where(sc["entering"], mat["phase_g"], 0.0),
            medium_g,
        )
        out["out_mg"] = jnp.where(vol_scatter, medium_g, surf_g)
    if replay_out is not None:
        out.update(replay_out)
    return out


# ---------------------------------------------------------------------------
# the forward kernel (thin wrapper: read refs -> physics -> store refs)
# ---------------------------------------------------------------------------

def _bounce_kernel(
    *refs,
    n_geoms: int, n_materials: int, nee: bool, t_min: float,
    mesh_merge: bool = False, features: frozenset = frozenset(),
    tex_defer: bool = False, mesh_uv: bool = False, vol_nee: bool = True,
    mesh_tables: tuple = (), emit_replay: bool = False,
):
    # ---- unpack refs (variadic: the mesh-merge variant adds 8 input and,
    # under NEE, 11 output planes; "hg" adds a medium-g input and output
    # plane; in-kernel meshes (mesh_tables) add their SMEM table refs
    # right after the seed — see bounce_fused)
    hg = "hg" in features
    gdata_ref, mat_ref, ldata_ref, scal_ref, seed_ref = refs[:5]
    base = 5
    mesh_refs = ()
    if mesh_tables:
        n_mtab = sum(2 + int(hn) + int(hu) for _, _, hn, hu in mesh_tables)
        mesh_refs = refs[base : base + n_mtab]
        base += n_mtab
    (
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        tx_ref, ty_ref, tz_ref,
        sample_ref, depth_ref, pspec_ref,
        mar_ref, mag_ref, mab_ref, ms_ref,
    ) = refs[base : base + 16]
    i = base + 16
    mg_ref = None
    if hg:
        mg_ref = refs[i]
        i += 1
    mesh_in = None
    if mesh_merge:
        (
            et_ref, epox_ref, epoy_ref, epoz_ref,
            enx_ref, eny_ref, enz_ref, emid_ref,
        ) = refs[i : i + 8]
        i += 8
        mesh_in = dict(
            et=et_ref[:],
            epo=(epox_ref[:], epoy_ref[:], epoz_ref[:]),
            en=(enx_ref[:], eny_ref[:], enz_ref[:]),
            emid=emid_ref[:],
        )
        if mesh_uv:
            muvu_ref, muvv_ref, muvf_ref = refs[i : i + 3]
            i += 3
            mesh_in["muv_u"] = muvu_ref[:]
            mesh_in["muv_v"] = muvv_ref[:]
            mesh_in["muvv"] = muvf_ref[:]
    (
        cr_ref, cg_ref, cb_ref,
        nox_ref, noy_ref, noz_ref,
        ndx_ref, ndy_ref, ndz_ref,
        tmr_ref, tmg_ref, tmb_ref,
        term_ref, wspec_ref, rru_ref,
        omr_ref, omg_ref, omb_ref, oms_ref,
    ) = refs[i : i + 19]
    i += 19
    omg_g_ref = None
    if hg:
        omg_g_ref = refs[i]
        i += 1
    replay_refs = None
    if emit_replay:
        replay_refs = refs[i : i + 2]
        i += 2
    tex_refs = None
    if tex_defer:
        tex_refs = refs[i : i + 3]
        i += 3
    if mesh_merge and nee:
        (
            shx_ref, shy_ref, shz_ref,
            wix_ref, wiy_ref, wiz_ref,
            ldist_ref, neer_ref, neeg_ref, neeb_ref, cv_ref,
        ) = refs[i : i + 11]

    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    throughput = (tx_ref[:], ty_ref[:], tz_ref[:])
    sample = sample_ref[:]
    depth = depth_ref[:]
    prev_state = pspec_ref[:]
    sigma_a = (mar_ref[:], mag_ref[:], mab_ref[:])
    sigma_s = ms_ref[:]

    # ---- RNG (bit-identical to bounce_uniforms fast path)
    u = hash_uniforms_planes(seed_ref[0], sample, depth, 11)

    gvals = read_gvals(gdata_ref, n_geoms)
    mvals = read_mvals(mat_ref, n_materials)
    mesh_hit_fn = mesh_occ_fn = mesh_occ_split_fn = None
    if mesh_tables:
        want_uv = tex_defer and any(hu for _, _, _, hu in mesh_tables)
        mesh_hit_fn = lambda: mesh_sweep_planes(  # noqa: E731
            mesh_tables, mesh_refs, gvals, o, d, t_min, want_uv
        )
        mesh_occ_fn = lambda x, wi: mesh_occ_planes(  # noqa: E731
            mesh_tables, mesh_refs, gvals, x, wi, t_min
        )
        mesh_occ_split_fn = lambda x, wi: mesh_occ_split_planes(  # noqa: E731
            mesh_tables, mesh_refs, gvals, mvals, x, wi, t_min
        )
    out = bounce_physics(
        o, d, throughput, sigma_a, sigma_s,
        gvals,
        mvals,
        read_lvals(ldata_ref, n_geoms),
        [scal_ref[0], scal_ref[1]],
        u, depth, prev_state, mesh_in,
        medium_g=(mg_ref[:] if hg else None),
        nee=nee, t_min=t_min, features=features, tex_defer=tex_defer,
        vol_nee=vol_nee,
        mesh_hit_fn=mesh_hit_fn, mesh_occ_fn=mesh_occ_fn,
        mesh_occ_split_fn=mesh_occ_split_fn,
        emit_replay=emit_replay,
    )

    cr_ref[:], cg_ref[:], cb_ref[:] = out["contrib"]
    nox_ref[:], noy_ref[:], noz_ref[:] = out["next_o"]
    ndx_ref[:], ndy_ref[:], ndz_ref[:] = out["next_d"]
    tmr_ref[:], tmg_ref[:], tmb_ref[:] = out["thr_mult"]
    # bool planes stored as 0/1 floats (Mosaic has no i1 vector memory)
    term_ref[:] = jnp.where(out["terminate"], 1.0, 0.0)
    wspec_ref[:] = out["wspec"]  # float emit-state code
    rru_ref[:] = out["rru"]
    omr_ref[:], omg_ref[:], omb_ref[:] = out["out_ma"]
    oms_ref[:] = out["out_ms"]
    if hg:
        omg_g_ref[:] = out["out_mg"]
    if emit_replay:
        replay_refs[0][:] = out["replay_gid"]
        replay_refs[1][:] = out["replay_nee_add"]
    if tex_defer:
        tex_refs[0][:] = out["tex_out"]["u"]
        tex_refs[1][:] = out["tex_out"]["v"]
        tex_refs[2][:] = out["tex_out"]["slot"]
    if mesh_merge and nee:
        nd = out["nee_deferred"]
        shx_ref[:], shy_ref[:], shz_ref[:] = nd["x"]
        wix_ref[:], wiy_ref[:], wiz_ref[:] = nd["wi"]
        ldist_ref[:] = nd["dist"]
        neer_ref[:], neeg_ref[:], neeb_ref[:] = nd["nee_rgb"]
        cv_ref[:] = nd["cand_vis"]


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------

def _to_planes(arr, npad):
    n = arr.shape[0]
    if npad != n:
        pad_width = [(0, npad - n)] + [(0, 0)] * (arr.ndim - 1)
        arr = jnp.pad(arr, pad_width)
    if arr.ndim == 1:
        return [arr.reshape(-1, LANES)]
    return [arr[:, i].reshape(-1, LANES) for i in range(arr.shape[1])]


def bounce_fused(
    scene: Scene,
    origin, direction, throughput, sample_idx, depth, prev_specular,
    medium_sigma, base_key, cfg, interpret: bool = False,
):
    """Run the fused bounce kernel; returns a render.common.BounceResult.

    Mesh scenes run the **mesh-merge** variant: the nearest-triangle winner
    (XLA chunked-LBVH, ops/intersect.mesh_only_hit) enters the kernel as 8
    extra input planes, and under NEE the shadow ray exits as 11 extra
    output planes so its triangle occlusion can be tested outside — the
    full shading/NEE/BSDF/volumetric pipeline stays fused either way.

    Precondition (enforced by the caller, render/common.py):
    ``cfg.fast_rng`` and no image textures."""
    from pathtracer_tpu.ops.rng import key_to_seed
    from pathtracer_tpu.render.common import BounceResult
    from pathtracer_tpu.scene.structs import Rays

    n = origin.shape[0]
    tile = ROWS * LANES
    npad = -(-n // tile) * tile
    rows = npad // LANES
    features = frozenset(cfg.features)
    hg = "hg" in features
    tex_defer = scene.textures is not None
    mesh_uv = False
    # in-kernel meshes (r5): SMEM-sized triangle tables sweep INSIDE the
    # kernel (winner + NEE occlusion) — no external mesh_only_hit, no
    # merge planes, no deferred NEE resolution
    mesh_inkernel = mesh_inkernel_eligible(scene.meshes)
    mesh_merge = bool(scene.meshes) and not mesh_inkernel
    mesh_descs, mesh_tabs = (), []
    if mesh_inkernel:
        mesh_descs, mesh_tabs = pack_mesh_tables(scene.meshes)

    depth_arr = jnp.broadcast_to(jnp.asarray(depth, jnp.int32), (n,))
    planes = (
        _to_planes(origin, npad)
        + _to_planes(direction, npad)
        + _to_planes(throughput, npad)
        + _to_planes(sample_idx.astype(jnp.int32), npad)
        + _to_planes(depth_arr, npad)
        + _to_planes(prev_specular.astype(jnp.float32), npad)
        + _to_planes(medium_sigma[:, :4], npad)
    )
    wide_medium = medium_sigma.shape[1] > 4
    if hg:
        # the carried HG phase-g rides as its own plane; the kernel
        # samples the Henyey-Greenstein direction in-plane (ADVICE r3:
        # the g channel is propagated, not zeroed)
        g_col = (
            medium_sigma[:, 4]
            if wide_medium
            else jnp.zeros((n,), medium_sigma.dtype)
        )
        planes += _to_planes(g_col, npad)
    if mesh_merge:
        from pathtracer_tpu.ops.intersect import mesh_only_hit

        any_attrs = any(m.has_attrs for m in scene.meshes)
        if any_attrs:
            # authored vn smooth normals ride the merge planes; authored
            # vt UVs enter as extra planes when the scene has image
            # textures (the kernel computes the final UV, the wrapper
            # samples the atlas)
            et, epobj, enrm, emid, _, muv, muvv = mesh_only_hit(
                Rays(origin=origin, direction=direction),
                scene.geoms, scene.meshes, T_MIN, with_attrs=True,
            )
        else:
            et, epobj, enrm, emid, _ = mesh_only_hit(
                Rays(origin=origin, direction=direction),
                scene.geoms, scene.meshes, T_MIN,
            )
        planes += (
            _to_planes(et, npad)
            + _to_planes(epobj, npad)
            + _to_planes(enrm, npad)
            + _to_planes(emid, npad)
        )
        if tex_defer and any_attrs:
            mesh_uv = True
            planes += (
                _to_planes(muv, npad)
                + _to_planes(muvv.astype(jnp.float32), npad)
            )

    gdata = _pack_gdata(scene.geoms)
    mdata = pack_material_table(scene.materials)
    ldata = pack_light_table(scene.geoms, scene.materials)
    scal = pack_scalars(scene)
    seed = key_to_seed(base_key).reshape(1)

    grid = (rows // ROWS,)
    plane = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fshp = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)

    n_in = (
        16 + (1 if hg else 0) + (8 if mesh_merge else 0)
        + (3 if mesh_uv else 0)
    )
    n_out = (
        19 + (1 if hg else 0) + (3 if tex_defer else 0)
        + (11 if (mesh_merge and cfg.nee) else 0)
    )
    outs = pl.pallas_call(
        functools.partial(
            _bounce_kernel,
            n_geoms=scene.geoms.count,
            n_materials=scene.materials.count,
            nee=cfg.nee,
            t_min=T_MIN,
            mesh_merge=mesh_merge,
            features=features,
            tex_defer=tex_defer,
            mesh_uv=mesh_uv,
            vol_nee=cfg.vol_nee,
            mesh_tables=mesh_descs,
        ),
        grid=grid,
        in_specs=[smem] * (5 + len(mesh_tabs)) + [plane] * n_in,
        out_specs=tuple([plane] * n_out),
        out_shape=tuple([fshp] * n_out),
        interpret=interpret,
    )(gdata, mdata, ldata, scal, seed, *mesh_tabs, *planes)

    def unp(i):
        return outs[i].reshape(-1)[:n]

    def unp3(i):
        return jnp.stack([unp(i), unp(i + 1), unp(i + 2)], axis=-1)

    tex_base = 19 + (1 if hg else 0)
    base = tex_base + (3 if tex_defer else 0)  # first mesh-NEE output
    contrib = unp3(0)
    thr_mult = unp3(9)
    wspec = unp(13)  # float emit-state code
    if tex_defer:
        # deferred image-texture fetch: the albedo enters contrib (emit
        # OR nee — disjoint per lane) and the diffuse throughput strictly
        # linearly, so one bilinear texel multiplies in exactly what the
        # split path folded into mat.color (render/common.py)
        from pathtracer_tpu.ops.texture import sample_atlas

        uv = jnp.stack([unp(tex_base), unp(tex_base + 1)], axis=-1)
        slot = unp(tex_base + 2)
        texel = sample_atlas(scene.textures, slot, uv)
        tmul = jnp.where((slot >= 0.0)[:, None], texel, 1.0)
        contrib = contrib * tmul
        # only diffuse surface events (state 0) carry the albedo in
        # their throughput multiplier
        thr_mult = jnp.where(
            ((slot >= 0.0) & (wspec < 0.5))[:, None],
            thr_mult * texel, thr_mult,
        )
    if mesh_merge and cfg.nee:
        # resolve the deferred NEE term: triangle occlusion of the
        # in-kernel shadow ray (exact split — see the kernel comment)
        from pathtracer_tpu.ops.intersect import mesh_only_occlusion

        sh_o = unp3(base)
        sh_d = unp3(base + 3)
        dist = unp(base + 6)
        nee_rgb = unp3(base + 7)
        cand_vis = unp(base + 10) > 0.5
        occ = mesh_only_occlusion(
            Rays(origin=sh_o, direction=sh_d), scene.geoms, scene.meshes, T_MIN
        )
        visible = cand_vis & (occ >= dist - 4.0 * RAY_BIAS)
        nee_add = jnp.where(visible[:, None], nee_rgb, 0.0)
        if tex_defer:
            nee_add = nee_add * tmul
        contrib = contrib + nee_add

    if hg:
        med_cols = [unp3(15), unp(18)[:, None], unp(19)[:, None]]
        if not wide_medium:
            med_cols = med_cols[:2]  # caller carries a narrow state
    else:
        med_cols = [unp3(15), unp(18)[:, None]] + (
            [jnp.zeros((n, 1), jnp.float32)] if wide_medium else []
        )
    return BounceResult(
        contrib=contrib,
        next_origin=unp3(3),
        next_direction=unp3(6),
        throughput_mult=thr_mult,
        terminate=unp(12) > 0.5,
        was_specular=wspec,
        rr_uniform=unp(14),
        next_medium=jnp.concatenate(med_cols, axis=-1),
    )
