"""Fused nearest-hit Pallas kernel — the hot op of the renderer.

The reference's trace kernel loops over geoms per CUDA thread
(``src/raytraceKernel.cu:137-148`` + ``src/intersections.h``).  The plain
XLA path (:mod:`pathtracer_tpu.ops.intersect`) turns that into a dense
``[N rays, G geoms]`` sweep — correct and differentiable, but it
materializes ``[N, G, 3]`` intermediates whose minor dimension of 3 tiles
terribly on the TPU's (8, 128) vector registers.

This module is the speed-of-light version for the forward engines: one
``pallas_call`` per wavefront that

* lays rays out as **component planes** ``[rows, 128]`` — every op is a
  full-width VPU op, nothing is padded;
* keeps the entire per-geom loop in **VMEM/registers**: the ``[N, G]``
  distance matrix never exists, only the running per-lane winner
  (``best_t``, geom id, the winner's object-space ray);
* reads the per-geom constants (inverse transform, type, material) as
  **SMEM scalars** broadcast against the planes — the geom loop is
  unrolled at trace time (G is static and small);
* recovers the winner's hit frame (object/world hit point, world normal
  via the inverse-transpose) in a second unrolled scalar-select pass, so
  the kernel's only HBM traffic is ``6 input + 12 output`` planes.

Two kernels: :func:`nearest_hit_planes` (full hit record) and
:func:`occlusion_t_planes` (distance only — shadow rays need no frame,
half the bandwidth).  Both are forward-only: the differentiable path
(render/diff.py) keeps the XLA sweep, which ``jax.grad`` understands.

Physics matches ops/intersect.py exactly: unit primitives in object space
via the inverse transform (``intersections.h:73-75,168``), unnormalized
object-space direction so ``t`` is world-space (see ops/intersect.py
docstring), slab cube test, argmax-|coord| face normals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.ops.intersect import (
    BIG,
    T_MIN,
    Hit,
    cube_t_planes as _cube_t_planes,
    sphere_t_planes as _sphere_t_planes,
)
from pathtracer_tpu.scene.structs import CUBE, SPHERE, Geoms, Rays

LANES = 128
ROWS = 64  # sublane rows per program => 8192 rays/program instance


def _geom_t(grow, ox, oy, oz, dx, dy, dz, t_min):
    """Distance plane for one geom given its row VALUES + its object-space
    ray planes.

    ``grow``: 14 scalars [m00 m01 m02 m03 m10..m13 m20..m23 type matid],
    the first three rows of the inverse transform.  Taking values (not a
    ref) keeps this usable under in-kernel ``jax.vjp`` (ops/bounce_grad.py
    differentiates w.r.t. the table scalars)."""
    m = grow
    oox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
    ooy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
    ooz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
    odx = m[0] * dx + m[1] * dy + m[2] * dz
    ody = m[4] * dx + m[5] * dy + m[6] * dz
    odz = m[8] * dx + m[9] * dy + m[10] * dz
    gtype = m[12]
    ts = _sphere_t_planes(oox, ooy, ooz, odx, ody, odz, t_min)
    tc = _cube_t_planes(oox, ooy, ooz, odx, ody, odz, t_min)
    # mesh slots (type==MESH) never hit here; merged by the wrapper
    t = jnp.where(
        gtype == float(SPHERE), ts, jnp.where(gtype == float(CUBE), tc, BIG)
    )
    return t, (oox, ooy, ooz, odx, ody, odz)


def _nearest_hit_kernel(
    gdata_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, gid_ref, mid_ref,
    px_ref, py_ref, pz_ref,
    pox_ref, poy_ref, poz_ref,
    nx_ref, ny_ref, nz_ref,
    *, n_geoms: int, t_min: float,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    best_t = jnp.full(ox.shape, BIG, jnp.float32)
    gid = jnp.zeros(ox.shape, jnp.int32)
    mid = jnp.zeros(ox.shape, jnp.int32)
    is_sphere = jnp.zeros(ox.shape, jnp.float32)  # float flag (Mosaic: no i1 vectors)
    w = [jnp.zeros(ox.shape, jnp.float32) for _ in range(6)]  # winner obj ray

    for g in range(n_geoms):  # static unroll: the reference's geom loop
        t_g, obj = _geom_t([gdata_ref[g, k] for k in range(12)] + [gdata_ref[g, 12], gdata_ref[g, 13]], ox, oy, oz, dx, dy, dz, t_min)
        better = t_g < best_t
        sph_flag = jnp.where(gdata_ref[g, 12] == float(SPHERE), 1.0, 0.0)
        best_t = jnp.where(better, t_g, best_t)
        gid = jnp.where(better, g, gid)
        mid = jnp.where(better, gdata_ref[g, 13].astype(jnp.int32), mid)
        is_sphere = jnp.where(better, sph_flag, is_sphere)
        w = [jnp.where(better, o, prev) for o, prev in zip(obj, w)]

    hit = best_t < BIG
    t_safe = jnp.where(hit, best_t, 1.0)
    # world + object hit points (object ray is affine => shared t)
    px, py, pz = ox + t_safe * dx, oy + t_safe * dy, oz + t_safe * dz
    pox = w[0] + t_safe * w[3]
    poy = w[1] + t_safe * w[4]
    poz = w[2] + t_safe * w[5]

    # object-space normal: sphere = radial; cube = argmax-|coord| face
    axx, axy, axz = jnp.abs(pox), jnp.abs(poy), jnp.abs(poz)
    fx = (axx >= axy) & (axx >= axz)
    fy = (~fx) & (axy >= axz)
    fz = (~fx) & (~fy)
    inv_len = jax.lax.rsqrt(jnp.maximum(pox**2 + poy**2 + poz**2, 1e-24))
    sph = is_sphere > 0.5
    nxo = jnp.where(sph, pox * inv_len, jnp.where(fx, jnp.sign(pox), 0.0))
    nyo = jnp.where(sph, poy * inv_len, jnp.where(fy, jnp.sign(poy), 0.0))
    nzo = jnp.where(sph, poz * inv_len, jnp.where(fz, jnp.sign(poz), 0.0))

    # world normal: inverse-transpose of the winner (transform_normal),
    # second unrolled scalar-select pass over geoms
    nwx = jnp.zeros_like(nxo)
    nwy = jnp.zeros_like(nxo)
    nwz = jnp.zeros_like(nxo)
    for g in range(n_geoms):
        sel = gid == g
        m = [gdata_ref[g, k] for k in range(12)]
        nwx = jnp.where(sel, m[0] * nxo + m[4] * nyo + m[8] * nzo, nwx)
        nwy = jnp.where(sel, m[1] * nxo + m[5] * nyo + m[9] * nzo, nwy)
        nwz = jnp.where(sel, m[2] * nxo + m[6] * nyo + m[10] * nzo, nwz)
    inv_n = jax.lax.rsqrt(jnp.maximum(nwx**2 + nwy**2 + nwz**2, 1e-24))

    t_ref[:] = best_t
    gid_ref[:] = gid
    mid_ref[:] = mid
    px_ref[:], py_ref[:], pz_ref[:] = px, py, pz
    pox_ref[:], poy_ref[:], poz_ref[:] = pox, poy, poz
    nx_ref[:], ny_ref[:], nz_ref[:] = nwx * inv_n, nwy * inv_n, nwz * inv_n


def _winner_kernel(
    gdata_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, gid_ref,
    *, n_geoms: int, t_min: float,
):
    """Winner-only nearest hit: best t + geom id, no hit frame.  The
    gradient-lean path (ops/intersect.intersect_scene_lean) re-derives the
    frame for the winner differentiably, so emitting the 10 frame planes
    here would be wasted bandwidth."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    best_t = jnp.full(ox.shape, BIG, jnp.float32)
    gid = jnp.zeros(ox.shape, jnp.int32)
    for g in range(n_geoms):
        t_g, _ = _geom_t([gdata_ref[g, k] for k in range(12)] + [gdata_ref[g, 12], gdata_ref[g, 13]], ox, oy, oz, dx, dy, dz, t_min)
        better = t_g < best_t
        best_t = jnp.where(better, t_g, best_t)
        gid = jnp.where(better, g, gid)
    t_ref[:] = best_t
    gid_ref[:] = gid


@functools.partial(jax.jit, static_argnames=("interpret",))
def winner_t_gid_planes(rays: Rays, geoms: Geoms, interpret: bool = False):
    """Winner search only: ``(t [N], geom_id [N])`` over analytic geoms."""
    comps, n, rows = _planes(rays)
    gdata = _pack_gdata(geoms)
    grid, gspec, plane = _specs(rows)
    t, gid = pl.pallas_call(
        functools.partial(_winner_kernel, n_geoms=geoms.count, t_min=T_MIN),
        grid=grid,
        in_specs=[gspec] + [plane] * 6,
        out_specs=(plane, plane),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(gdata, *comps)
    return t.reshape(-1)[:n], gid.reshape(-1)[:n]


def _occlusion_kernel(
    gdata_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref,
    *, n_geoms: int, t_min: float,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    best_t = jnp.full(ox.shape, BIG, jnp.float32)
    for g in range(n_geoms):
        t_g, _ = _geom_t([gdata_ref[g, k] for k in range(12)] + [gdata_ref[g, 12], gdata_ref[g, 13]], ox, oy, oz, dx, dy, dz, t_min)
        best_t = jnp.minimum(best_t, t_g)
    t_ref[:] = best_t


def _pack_gdata(geoms: Geoms) -> jax.Array:
    """[G, 14] fp32 per-geom constants: inv rows 0..2, type, material_id."""
    inv12 = geoms.inv_transform.reshape(geoms.count, 16)[:, :12]
    return jnp.concatenate(
        [
            inv12,
            geoms.type.astype(jnp.float32)[:, None],
            geoms.material_id.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )


def _planes(rays: Rays):
    """[N,3] SoA -> 6 padded component planes [R, 128] + (N, Rpad)."""
    n = rays.origin.shape[0]
    tile = ROWS * LANES
    npad = -(-n // tile) * tile
    o = rays.origin
    d = rays.direction
    if npad != n:
        pad = npad - n
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
        # padded lanes get a non-degenerate direction so no kernel op traps
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], axis=0)
    comps = [o[:, i].reshape(-1, LANES) for i in range(3)] + [
        d[:, i].reshape(-1, LANES) for i in range(3)
    ]
    return comps, n, npad // LANES


def _specs(rows: int):
    grid = (rows // ROWS,)
    plane = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return grid, gspec, plane


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_hit_planes(rays: Rays, geoms: Geoms, interpret: bool = False):
    """Fused nearest-hit over all analytic geoms.  Returns a :class:`Hit`
    (mesh slots report miss; merge meshes in the caller)."""
    comps, n, rows = _planes(rays)
    gdata = _pack_gdata(geoms)
    grid, gspec, plane = _specs(rows)

    shp = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishp = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    outs = pl.pallas_call(
        functools.partial(
            _nearest_hit_kernel, n_geoms=geoms.count, t_min=T_MIN
        ),
        grid=grid,
        in_specs=[gspec] + [plane] * 6,
        out_specs=tuple([plane] * 12),
        out_shape=(shp, ishp, ishp) + (shp,) * 9,
        interpret=interpret,
    )(gdata, *comps)

    def unp(x):
        return x.reshape(-1)[:n]

    t, gid, mid = unp(outs[0]), unp(outs[1]), unp(outs[2])
    p = jnp.stack([unp(outs[3 + i]) for i in range(3)], axis=-1)
    p_obj = jnp.stack([unp(outs[6 + i]) for i in range(3)], axis=-1)
    nrm = jnp.stack([unp(outs[9 + i]) for i in range(3)], axis=-1)
    return Hit(
        t=t,
        hit=t < BIG,
        geom_id=gid,
        material_id=mid,
        position=p,
        position_obj=p_obj,
        normal=nrm,
    )


def intersect_scene_pallas(
    rays: Rays, geoms: Geoms, meshes: tuple = (), interpret: bool = False
) -> Hit:
    """Drop-in replacement for :func:`ops.intersect.intersect_scene` on the
    forward path: fused analytic kernel + XLA triangle-mesh merge."""
    hit = nearest_hit_planes(rays, geoms, interpret=interpret)
    if not meshes:
        return hit
    from pathtracer_tpu.ops.intersect import mesh_only_hit

    any_attrs = any(m.has_attrs for m in meshes)
    if any_attrs:
        mt, mpo, mnw, mmid, mgid, muv, muvv = mesh_only_hit(
            rays, geoms, meshes, with_attrs=True
        )
    else:
        mt, mpo, mnw, mmid, mgid = mesh_only_hit(rays, geoms, meshes)
    better = mt < hit.t
    b = better[:, None]
    t = jnp.where(better, mt, hit.t)
    t_safe = jnp.where(t < BIG, t, 1.0)
    return Hit(
        t=t,
        hit=t < BIG,
        geom_id=jnp.where(better, mgid, hit.geom_id),
        material_id=jnp.where(better, mmid, hit.material_id),
        position=jnp.where(
            b, rays.origin + t_safe[:, None] * rays.direction, hit.position
        ),
        position_obj=jnp.where(b, mpo, hit.position_obj),
        normal=jnp.where(b, mnw, hit.normal),
        uv=jnp.where(b, muv, 0.0) if any_attrs else None,
        uv_valid=(better & muvv) if any_attrs else None,
    )


def occlusion_scene_pallas(
    rays: Rays, geoms: Geoms, meshes: tuple = (), interpret: bool = False
) -> jax.Array:
    """Nearest ``t`` per shadow ray (BIG = unoccluded), meshes included."""
    t = occlusion_t_planes(rays, geoms, interpret=interpret)
    if meshes:
        from pathtracer_tpu.ops.intersect import mesh_occlusion_t
        from pathtracer_tpu.ops.transforms import transform_dir, transform_point

        for m in meshes:
            inv = geoms.inv_transform[m.geom_index]
            o_obj = transform_point(inv, rays.origin)
            d_obj = transform_dir(inv, rays.direction)
            t = jnp.minimum(t, mesh_occlusion_t(m, o_obj, d_obj))
    return t


@functools.partial(jax.jit, static_argnames=("interpret",))
def occlusion_t_planes(rays: Rays, geoms: Geoms, interpret: bool = False):
    """Distance-only sweep for shadow rays: nearest analytic-geom ``t``
    per ray (BIG = clear)."""
    comps, n, rows = _planes(rays)
    gdata = _pack_gdata(geoms)
    grid, gspec, plane = _specs(rows)
    out = pl.pallas_call(
        functools.partial(_occlusion_kernel, n_geoms=geoms.count, t_min=T_MIN),
        grid=grid,
        in_specs=[gspec] + [plane] * 6,
        out_specs=plane,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(gdata, *comps)
    return out.reshape(-1)[:n]
