"""Full-depth fused trace kernel: the ENTIRE path trace in one
``pallas_call`` (VERDICT r3 #2 — multi-bounce fusion).

The per-bounce fused kernel (ops/bounce_pallas.py) still paid, per
bounce, the pack/unpack of ~35 state planes through HBM plus a
pallas-call launch and the XLA glue between bounces — measured ~1.2 ms
marginal per bounce at 640k lanes where the kernel's own HBM+compute
bound is ~0.3 ms.  This kernel loops all ``max_depth`` bounces INSIDE
the kernel: path state (origin, direction, throughput, medium,
alive/spec flags, the radiance accumulator) lives in VMEM/registers for
the whole path, and the only HBM traffic per wavefront is 7 input planes
(primary ray + sample id) and 3 output planes (radiance) — a ~50x
reduction in bounce-loop HBM traffic.

Engine semantics are the masked megakernel's (render/megakernel.py
``trace_paths``), bit-for-bit: same physics (:func:`bounce_physics` is
called per bounce — one source of truth), same RNG planes, same alive
masking, russian-roulette, and ray-count accounting.  The equality is
pinned by tests/test_trace_pallas.py.

Scope: analytic scenes and, since r5, triangle meshes whose tables fit
SMEM (the in-kernel sweep, ops/bounce_pallas.mesh_sweep_planes — winner,
smooth vn normals, and NEE occlusion all inside the loop); image-texture
scenes take the per-bounce deferred-texel path.  Reference: this is the
completed assignment's ``raytraceRay`` trace loop
(src/raytraceKernel.cu:123-159 + the TODO at :121) as one Mosaic kernel,
with the MESH branch (:144-145) filled in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.ops.bounce_pallas import (
    bounce_physics,
    hash_uniforms_planes,
    mesh_inkernel_eligible,
    mesh_occ_planes,
    mesh_occ_split_planes,
    mesh_sweep_planes,
    pack_light_table,
    pack_material_table,
    pack_mesh_tables,
    pack_scalars,
    read_gvals,
    read_lvals,
    read_mvals,
)
from pathtracer_tpu.ops.intersect import T_MIN
from pathtracer_tpu.ops.intersect_pallas import LANES, _pack_gdata

TRACE_ROWS = 32  # rows per program: the full bounce loop keeps ~20 state
# planes live; 32x128 tiles stay well inside VMEM with the physics'
# intermediates on top


def _trace_kernel(
    *refs,
    n_geoms: int, n_materials: int, nee: bool, t_min: float,
    max_depth: int, rr: bool, rr_start: int,
    features: frozenset = frozenset(), vol_nee: bool = True,
    mesh_tables: tuple = (),
):
    gdata_ref, mat_ref, ldata_ref, scal_ref, seed_ref, nvalid_ref = refs[:6]
    base = 6
    mesh_refs = ()
    if mesh_tables:
        n_mtab = sum(2 + int(hn) + int(hu) for _, _, hn, hu in mesh_tables)
        mesh_refs = refs[base : base + n_mtab]
        base += n_mtab
    (
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, sample_ref,
        rr_ref, rg_ref, rb_ref, nrays_ref,
    ) = refs[base : base + 11]
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    sample = sample_ref[:]
    seed = seed_ref[0]

    gvals = read_gvals(gdata_ref, n_geoms)
    mvals = read_mvals(mat_ref, n_materials)
    lvals = read_lvals(ldata_ref, n_geoms)
    svals = [scal_ref[0], scal_ref[1]]

    hg = "hg" in features
    shape = o[0].shape
    throughput = (jnp.ones(shape, jnp.float32),) * 3
    sigma_a = (jnp.zeros(shape, jnp.float32),) * 3
    sigma_s = jnp.zeros(shape, jnp.float32)
    # HG phase-g is pure internal state here: the loop never leaves the
    # kernel, so the wide-medium plane cost the split path pays per
    # bounce is free (ADVICE r3 closed for this engine)
    medium_g = jnp.zeros(shape, jnp.float32) if hg else None
    # pad lanes (beyond the true wavefront) start dead: they trace no
    # rays, contribute no radiance, and never touch the ray counter
    row_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane_idx = (pl.program_id(0) * shape[0] + row_ids) * shape[1] + col_ids
    alive = lane_idx < nvalid_ref[0]
    prev_state = jnp.zeros(shape, jnp.float32)  # emit-state code
    radiance = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
    nrays = jnp.float32(0.0)
    ray_mult = 2.0 if nee else 1.0

    for dep in range(max_depth):  # static unroll: the reference's
        # iterative trace loop (raytraceKernel.cu:121 TODO), all in VMEM
        depth = jnp.full(shape, dep, jnp.int32)
        nrays = nrays + jnp.sum(alive.astype(jnp.float32)) * ray_mult
        u = hash_uniforms_planes(seed, sample, depth, 11)
        mesh_hit_fn = mesh_occ_fn = mesh_occ_split_fn = None
        if mesh_tables:
            # closures over THIS bounce's ray planes (o/d change per
            # depth); the SMEM triangle tables are loop-invariant
            mesh_hit_fn = functools.partial(
                mesh_sweep_planes,
                mesh_tables, mesh_refs, gvals, o, d, t_min, False,
            )
            mesh_occ_fn = functools.partial(
                mesh_occ_planes, mesh_tables, mesh_refs, gvals,
                t_min=t_min,
            )
            mesh_occ_split_fn = functools.partial(
                mesh_occ_split_planes, mesh_tables, mesh_refs, gvals,
                mvals, t_min=t_min,
            )
        out = bounce_physics(
            o, d, throughput, sigma_a, sigma_s,
            gvals, mvals, lvals, svals,
            u, depth, prev_state, None, medium_g=medium_g,
            nee=nee, t_min=t_min, features=features, vol_nee=vol_nee,
            mesh_hit_fn=mesh_hit_fn, mesh_occ_fn=mesh_occ_fn,
            mesh_occ_split_fn=mesh_occ_split_fn,
        )
        for c in range(3):
            radiance[c] = radiance[c] + jnp.where(
                alive, out["contrib"][c], 0.0
            )
        new_alive = alive & (~out["terminate"])
        throughput = tuple(
            jnp.where(new_alive, t * m, t)
            for t, m in zip(throughput, out["thr_mult"])
        )
        if rr:
            p = jnp.clip(
                jnp.maximum(jnp.maximum(throughput[0], throughput[1]), throughput[2]),
                0.05, 1.0,
            )
            rr_active = new_alive & (dep >= rr_start)
            survive = out["rru"] < p
            inv_p = 1.0 / p
            throughput = tuple(
                jnp.where(rr_active, t * inv_p, t) for t in throughput
            )
            # boolean algebra, not where-on-bools: Mosaic cannot select
            # i1 vectors; where(c, a & s, a) == a & (s | ~c)
            new_alive = new_alive & (survive | (~rr_active))
        o = tuple(
            jnp.where(new_alive, n, prev) for n, prev in zip(out["next_o"], o)
        )
        d = tuple(
            jnp.where(new_alive, n, prev) for n, prev in zip(out["next_d"], d)
        )
        alive = new_alive
        prev_state = out["wspec"]
        sigma_a = out["out_ma"]
        sigma_s = out["out_ms"]
        if hg:
            medium_g = out["out_mg"]

    rr_ref[:], rg_ref[:], rb_ref[:] = radiance

    # measured-ray counter, accumulated across the sequential grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        nrays_ref[0, 0] = 0.0

    nrays_ref[0, 0] += nrays


def fused_trace_eligible(scene, cfg) -> bool:
    """Scene scope of the one-kernel trace: no image textures (atlas
    gathers stay outside kernels — those scenes take the per-bounce
    deferred-texel path), counter-hash RNG, and meshes only when their
    triangle tables fit SMEM (r5: the in-kernel sweep —
    ops/bounce_pallas.mesh_sweep_planes — handles winner, smooth
    normals, and NEE occlusion; bigger meshes take the per-bounce
    mesh-merge path with the chunked LBVH outside).  Every material
    feature — procedural textures, bump, volumetrics, glossy,
    Cook-Torrance, Ward, Henyey-Greenstein — is modeled in-kernel.
    (Config knobs — engine choice, debug — are the caller's business.)"""
    if not cfg.fast_rng:
        return False
    if scene.textures is not None:
        return False
    if scene.meshes and not mesh_inkernel_eligible(scene.meshes):
        return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_geoms", "n_materials", "nee", "max_depth", "rr", "rr_start",
        "features", "vol_nee", "interpret", "mesh_descs",
    ),
)
def _trace_call(
    gdata, mdata, ldata, scal, seed,
    origin, direction, sample_idx, mesh_tabs,
    *, n_geoms, n_materials, nee, max_depth, rr, rr_start, features,
    vol_nee, interpret, mesh_descs=(),
):
    n = origin.shape[0]
    tile = TRACE_ROWS * LANES
    npad = -(-n // tile) * tile
    rows = npad // LANES

    def pad(arr, value=0.0):
        if npad != n:
            arr = jnp.pad(
                arr, [(0, npad - n)] + [(0, 0)] * (arr.ndim - 1),
                constant_values=value,
            )
        if arr.ndim == 1:
            return [arr.reshape(-1, LANES)]
        return [arr[:, i].reshape(-1, LANES) for i in range(arr.shape[1])]

    planes = (
        pad(origin) + pad(direction, value=1.0)
        + pad(sample_idx.astype(jnp.int32))
    )
    nvalid = jnp.asarray([n], jnp.int32)
    grid = (rows // TRACE_ROWS,)
    plane = pl.BlockSpec(
        (TRACE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fshp = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(
            _trace_kernel,
            n_geoms=n_geoms, n_materials=n_materials, nee=nee, t_min=T_MIN,
            max_depth=max_depth, rr=rr, rr_start=rr_start,
            features=features, vol_nee=vol_nee, mesh_tables=mesh_descs,
        ),
        grid=grid,
        in_specs=[smem] * (6 + len(mesh_tabs)) + [plane] * 7,
        out_specs=(
            plane, plane, plane,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            fshp, fshp, fshp,
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(gdata, mdata, ldata, scal, seed, nvalid, *mesh_tabs, *planes)
    radiance = jnp.stack(
        [outs[c].reshape(-1)[:n] for c in range(3)], axis=-1
    )
    return radiance, outs[3][0, 0]


def trace_fused(scene, rays, sample_idx, base_key, cfg):
    """Drop-in for render/megakernel.trace_paths on eligible scenes:
    ``(radiance [N, 3], rays_traced [])`` — the whole bounce loop in one
    kernel call."""
    from pathtracer_tpu.ops.rng import key_to_seed

    interpret = jax.default_backend() != "tpu"
    seed = key_to_seed(base_key).reshape(1)
    mesh_descs, mesh_tabs = (), []
    if scene.meshes:
        mesh_descs, mesh_tabs = pack_mesh_tables(scene.meshes)
    return _trace_call(
        _pack_gdata(scene.geoms),
        pack_material_table(scene.materials),
        pack_light_table(scene.geoms, scene.materials),
        pack_scalars(scene),
        seed,
        rays.origin, rays.direction, sample_idx, mesh_tabs,
        n_geoms=scene.geoms.count,
        n_materials=scene.materials.count,
        nee=cfg.nee,
        max_depth=cfg.max_depth,
        rr=cfg.russian_roulette,
        rr_start=cfg.rr_start,
        features=frozenset(cfg.features),
        vol_nee=cfg.vol_nee,
        interpret=interpret,
        mesh_descs=mesh_descs,
    )
