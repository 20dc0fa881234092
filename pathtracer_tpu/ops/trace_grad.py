"""Full-depth differentiable trace: the ENTIRE path trace forward AND
backward in one ``pallas_call`` each (the r5 fwd+bwd speed work).

The per-bounce fused-diff engine (ops/bounce_grad.py) runs, per
progressive iteration, ``max_depth`` forward launches inside the scan
plus ``max_depth`` backward launches in its transpose — measured ~62 ms
primal + ~90 ms backward at 800x800 d8 gspp=4 where the per-launch
overhead+glue (~1-2 ms x 64 launches) dominates the physics.  This
module is the launch-count fix, the same step the forward took in r4
(ops/trace_pallas.py):

* ``_tfwd_kernel`` — the full bounce loop in one kernel (identical loop
  body to ``trace_pallas._trace_kernel``), additionally streaming the
  per-bounce carries (origin, direction, throughput, medium, emit-state,
  alive) and the forward-resolved discrete outcomes (winner gid, NEE
  visibility — see bounce_physics' winner-replay docs) to HBM as
  residuals: 17 planes x depth ~= 0.5 ms of extra HBM traffic per
  640k-lane iteration.
* ``_tbwd_kernel`` — the reverse loop in one kernel: for each bounce,
  newest first, re-runs the winner-replay physics under ``jax.vjp``
  (recompute AND transpose fused in VMEM) and chains the carry
  cotangents; table cotangents accumulate across bounces and grid
  programs into one SMEM row.

Gradient semantics are identical to the per-bounce fused-diff and lean
engines a.e. (pinned by tests/test_trace_grad.py): detached sampling,
winner-only intersection cotangents, detached RR probability
(``stop_gradient(p)`` — render/megakernel.py), zero-cotangent
visibility.

Scope = render/common.fused_diff_eligible (analytic scenes, no image
atlas, counter-hash RNG, no HG); ``RenderConfig.grad_full_trace=False``
falls back to the per-bounce fused-diff engine.  Reference: this is
forward+reverse of the completed trace loop
(``src/raytraceKernel.cu:123-159``), which the reference cannot
differentiate at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.ops.bounce_grad import (
    GDATA_COLS,
    LDATA_COLS,
    _grad_row_len,
)
from pathtracer_tpu.ops.bounce_pallas import (
    MAT_FIELDS,
    bounce_physics,
    hash_uniforms_planes,
    pack_light_table,
    pack_material_table,
    pack_scalars,
    read_gvals,
    read_lvals,
    read_mvals,
)
from pathtracer_tpu.ops.intersect import T_MIN
from pathtracer_tpu.ops.intersect_pallas import LANES, _pack_gdata

TFWD_ROWS = 32  # forward tile: same live set as trace_pallas + the
# residual stores
TBWD_ROWS = 64  # backward tile (measured on v5e, 800x800 d8 gspp4:
# 16 -> 309, 32 -> 319, 64 -> 318-325 Mrays/s fwd+bwd; the winner-
# replay vjp's live set fits 64x128 tiles inside the raised scoped-VMEM
# limit below)

# per-bounce residual planes: o(3) d(3) thr(3) sigma_a(3) sigma_s(1)
# prev_state(1) alive(1) replay_gid(1) replay_nee_add(1)
N_RESID = 17


def _step_update(out, o, d, thr, sa, ss, alive, dep, *, rr, rr_start):
    """The megakernel scan-body update (render/megakernel.py bounce()),
    on planes: radiance increment + next carries.  Shared verbatim by the
    forward loop and the backward's differentiated step so the two cannot
    drift."""
    rad_inc = tuple(jnp.where(alive, c, 0.0) for c in out["contrib"])
    new_alive = alive & (~out["terminate"])
    thr2 = tuple(
        jnp.where(new_alive, t * m, t) for t, m in zip(thr, out["thr_mult"])
    )
    if rr:
        p = jax.lax.stop_gradient(
            jnp.clip(
                jnp.maximum(jnp.maximum(thr2[0], thr2[1]), thr2[2]), 0.05, 1.0
            )
        )
        rr_active = new_alive & (dep >= rr_start)
        survive = out["rru"] < p
        inv_p = 1.0 / p
        thr2 = tuple(jnp.where(rr_active, t * inv_p, t) for t in thr2)
        # boolean algebra, not where-on-bools: Mosaic cannot select i1
        # vectors (arith.trunci i8->i1); where(c, a & s, a) == a & (s | ~c)
        new_alive = new_alive & (survive | (~rr_active))
    next_o = tuple(
        jnp.where(new_alive, n, prev) for n, prev in zip(out["next_o"], o)
    )
    next_d = tuple(
        jnp.where(new_alive, n, prev) for n, prev in zip(out["next_d"], d)
    )
    # medium carries update unconditionally (dead lanes never feed
    # radiance, so the unmasked pass-through is free — same as the scan)
    next_sa = out["out_ma"]
    next_ss = out["out_ms"]
    return rad_inc, new_alive, thr2, next_o, next_d, next_sa, next_ss


def _tfwd_kernel(
    *refs,
    n_geoms: int, n_materials: int, nee: bool, t_min: float,
    max_depth: int, rr: bool, rr_start: int,
    features: frozenset = frozenset(), vol_nee: bool = True,
):
    gdata_ref, mat_ref, ldata_ref, scal_ref, seed_ref, nvalid_ref = refs[:6]
    (
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, sample_ref,
    ) = refs[6:13]
    rr_ref, rg_ref, rb_ref, nrays_ref = refs[13:17]
    res_refs = refs[17 : 17 + N_RESID]

    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    sample = sample_ref[:]
    seed = seed_ref[0]

    gvals = read_gvals(gdata_ref, n_geoms)
    mvals = read_mvals(mat_ref, n_materials)
    lvals = read_lvals(ldata_ref, n_geoms)
    svals = [scal_ref[0], scal_ref[1]]

    shape = o[0].shape
    throughput = (jnp.ones(shape, jnp.float32),) * 3
    sigma_a = (jnp.zeros(shape, jnp.float32),) * 3
    sigma_s = jnp.zeros(shape, jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane_idx = (pl.program_id(0) * shape[0] + row_ids) * shape[1] + col_ids
    alive = lane_idx < nvalid_ref[0]
    prev_state = jnp.zeros(shape, jnp.float32)
    radiance = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
    nrays = jnp.float32(0.0)
    ray_mult = 2.0 if nee else 1.0

    for dep in range(max_depth):
        # ---- stream this bounce's carries to HBM (the bwd's residuals)
        carry_planes = (
            o + d + throughput + sigma_a
            + (sigma_s, prev_state, jnp.where(alive, 1.0, 0.0))
        )
        for k, v in enumerate(carry_planes):
            res_refs[k][dep] = v

        depth = jnp.full(shape, dep, jnp.int32)
        nrays = nrays + jnp.sum(alive.astype(jnp.float32)) * ray_mult
        u = hash_uniforms_planes(seed, sample, depth, 11)
        out = bounce_physics(
            o, d, throughput, sigma_a, sigma_s,
            gvals, mvals, lvals, svals,
            u, depth, prev_state, None,
            nee=nee, t_min=t_min, features=features, vol_nee=vol_nee,
            emit_replay=True,
        )
        res_refs[15][dep] = out["replay_gid"]
        res_refs[16][dep] = out["replay_nee_add"]

        rad_inc, alive, throughput, o, d, sigma_a, sigma_s = _step_update(
            out, o, d, throughput, sigma_a, sigma_s, alive, dep,
            rr=rr, rr_start=rr_start,
        )
        for c in range(3):
            radiance[c] = radiance[c] + rad_inc[c]
        prev_state = out["wspec"]

    rr_ref[:], rg_ref[:], rb_ref[:] = radiance

    @pl.when(pl.program_id(0) == 0)
    def _():
        nrays_ref[0, 0] = 0.0

    nrays_ref[0, 0] += nrays


def _tbwd_kernel(
    *refs,
    n_geoms: int, n_materials: int, nee: bool, t_min: float,
    max_depth: int, rr: bool, rr_start: int,
    features: frozenset = frozenset(), vol_nee: bool = True,
):
    gdata_ref, mat_ref, ldata_ref, scal_ref, seed_ref = refs[:5]
    sample_ref = refs[5]
    res_refs = refs[6 : 6 + N_RESID]
    gr_ref, gg_ref, gb_ref = refs[6 + N_RESID : 9 + N_RESID]
    (
        dox_ref, doy_ref, doz_ref, ddx_ref, ddy_ref, ddz_ref,
    ) = refs[9 + N_RESID : 15 + N_RESID]
    dtab_ref = refs[15 + N_RESID]

    sample = sample_ref[:]
    seed = seed_ref[0]
    gvals = read_gvals(gdata_ref, n_geoms)
    mvals = read_mvals(mat_ref, n_materials)
    lvals = read_lvals(ldata_ref, n_geoms)
    svals = [scal_ref[0], scal_ref[1]]

    shape = sample.shape
    zero = jnp.zeros(shape, jnp.float32)
    # the radiance accumulator's cotangent is constant across bounces
    g_rad = (gr_ref[:], gg_ref[:], gb_ref[:])
    # carry cotangents at the loop exit are zero (the scan discards the
    # final carries)
    g_o = (zero,) * 3
    g_d = (zero,) * 3
    g_thr = (zero,) * 3
    g_sa = (zero,) * 3
    g_ss = zero

    # running table cotangents, accumulated across the bounce loop
    acc_g = tuple(
        tuple(jnp.float32(0.0) for _ in range(GDATA_COLS))
        for _ in range(n_geoms)
    )
    acc_m = tuple(
        tuple(jnp.float32(0.0) for _ in range(MAT_FIELDS))
        for _ in range(n_materials)
    )
    acc_l = tuple(
        tuple(jnp.float32(0.0) for _ in range(LDATA_COLS))
        for _ in range(n_geoms)
    )
    acc_s = (jnp.float32(0.0), jnp.float32(0.0))

    # ONE fori_loop body (not a static unroll): the in-kernel vjp is by
    # far the largest code body in the framework — unrolled max_depth
    # times it cost ~30 min of cold interpret-mode compile per config
    # and a matching icache footprint on TPU.  Residual reads index the
    # depth axis dynamically instead.
    def bounce_bwd(i, carry):
        g_o, g_d, g_thr, g_sa, g_ss, acc_g, acc_m, acc_l, acc_s = carry
        dep = max_depth - 1 - i
        o = tuple(res_refs[k][dep] for k in range(3))
        d = tuple(res_refs[k][dep] for k in range(3, 6))
        thr = tuple(res_refs[k][dep] for k in range(6, 9))
        sa = tuple(res_refs[k][dep] for k in range(9, 12))
        ss = res_refs[12][dep]
        prev_state = res_refs[13][dep]
        alive = res_refs[14][dep] > 0.5
        replay = {"gid": res_refs[15][dep], "nee_add": res_refs[16][dep]}
        depth = jnp.full(shape, dep, jnp.int32)
        u = hash_uniforms_planes(seed, sample, depth, 11)

        def f(o, d, thr, sa, ss, gvals, mvals, lvals, svals):
            out = bounce_physics(
                o, d, thr, sa, ss, gvals, mvals, lvals, svals,
                u, depth, prev_state, None,
                nee=nee, t_min=t_min, features=features, vol_nee=vol_nee,
                replay=replay,
            )
            rad_inc, _, thr2, next_o, next_d, next_sa, next_ss = _step_update(
                out, o, d, thr, sa, ss, alive, dep, rr=rr, rr_start=rr_start,
            )
            return rad_inc, next_o, next_d, thr2, next_sa, next_ss

        _, vjp = jax.vjp(f, o, d, thr, sa, ss, gvals, mvals, lvals, svals)
        d_o, d_d, d_thr, d_sa, d_ss, d_g, d_m, d_l, d_s = vjp(
            (g_rad, g_o, g_d, g_thr, g_sa, g_ss)
        )
        acc_g = tuple(
            tuple(a + d_g[g][k] for k, a in enumerate(row))
            for g, row in enumerate(acc_g)
        )
        acc_l = tuple(
            tuple(a + d_l[g][k] for k, a in enumerate(row))
            for g, row in enumerate(acc_l)
        )
        acc_m = tuple(
            tuple(a + d_m[m][k] for k, a in enumerate(row))
            for m, row in enumerate(acc_m)
        )
        acc_s = (acc_s[0] + d_s[0], acc_s[1] + d_s[1])
        return d_o, d_d, d_thr, d_sa, d_ss, acc_g, acc_m, acc_l, acc_s

    g_o, g_d, g_thr, g_sa, g_ss, acc_g, acc_m, acc_l, acc_s = (
        jax.lax.fori_loop(
            0, max_depth, bounce_bwd,
            (g_o, g_d, g_thr, g_sa, g_ss, acc_g, acc_m, acc_l, acc_s),
        )
    )

    dox_ref[:], doy_ref[:], doz_ref[:] = g_o
    ddx_ref[:], ddy_ref[:], ddz_ref[:] = g_d

    @pl.when(pl.program_id(0) == 0)
    def _():
        for j in range(_grad_row_len(n_geoms, n_materials)):
            dtab_ref[0, j] = 0.0

    idx = 0
    for g in range(n_geoms):
        for k in range(GDATA_COLS):
            dtab_ref[0, idx] += acc_g[g][k]
            idx += 1
    for m in range(n_materials):
        for k in range(MAT_FIELDS):
            dtab_ref[0, idx] += acc_m[m][k]
            idx += 1
    for g in range(n_geoms):
        for k in range(LDATA_COLS):
            dtab_ref[0, idx] += acc_l[g][k]
            idx += 1
    dtab_ref[0, idx] += acc_s[0]
    dtab_ref[0, idx + 1] += acc_s[1]


def _pad_planes(arr, npad, value=0.0):
    n = arr.shape[0]
    if npad != n:
        arr = jnp.pad(
            arr, [(0, npad - n)] + [(0, 0)] * (arr.ndim - 1),
            constant_values=value,
        )
    if arr.ndim == 1:
        return [arr.reshape(-1, LANES)]
    return [arr[:, i].reshape(-1, LANES) for i in range(arr.shape[1])]


def _tfwd_call(
    gdata, mdata, ldata, scal, seed, origin, direction, sample_idx,
    *, n_geoms, n_materials, nee, max_depth, rr, rr_start, features,
    vol_nee, interpret,
):
    """-> (radiance [N,3], nrays [], residuals tuple of [depth, rows, LANES])."""
    n = origin.shape[0]
    # pad to a multiple of BOTH tile sizes: the backward re-grids the
    # same residual rows with its own (larger) tile
    tile = max(TFWD_ROWS, TBWD_ROWS) * LANES
    npad = -(-n // tile) * tile
    rows = npad // LANES
    planes = (
        _pad_planes(origin, npad)
        + _pad_planes(direction, npad, value=1.0)
        + _pad_planes(sample_idx.astype(jnp.int32), npad)
    )
    nvalid = jnp.asarray([n], jnp.int32)
    grid = (rows // TFWD_ROWS,)
    plane = pl.BlockSpec(
        (TFWD_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    resid = pl.BlockSpec(
        (max_depth, TFWD_ROWS, LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fshp = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    rshp = jax.ShapeDtypeStruct((max_depth, rows, LANES), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(
            _tfwd_kernel,
            n_geoms=n_geoms, n_materials=n_materials, nee=nee, t_min=T_MIN,
            max_depth=max_depth, rr=rr, rr_start=rr_start,
            features=features, vol_nee=vol_nee,
        ),
        grid=grid,
        in_specs=[smem] * 6 + [plane] * 7,
        out_specs=tuple(
            [plane] * 3
            + [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
            + [resid] * N_RESID
        ),
        out_shape=tuple(
            [fshp] * 3
            + [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
            + [rshp] * N_RESID
        ),
        interpret=interpret,
    )(gdata, mdata, ldata, scal, seed, nvalid, *planes)
    radiance = jnp.stack([outs[c].reshape(-1)[:n] for c in range(3)], axis=-1)
    return radiance, outs[3][0, 0], tuple(outs[4:])


def _tbwd_call(
    gdata, mdata, ldata, scal, seed, sample_idx, residuals, g_radiance,
    *, n, n_geoms, n_materials, nee, max_depth, rr, rr_start, features,
    vol_nee, interpret,
):
    """-> (d_gdata, d_mdata, d_ldata, d_scal, d_origin, d_direction)."""
    rows = residuals[0].shape[1]
    assert rows % TBWD_ROWS == 0, (rows, TBWD_ROWS)  # _tfwd_call pads for both
    npad = rows * LANES
    grid = (rows // TBWD_ROWS,)
    plane = pl.BlockSpec(
        (TBWD_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    resid = pl.BlockSpec(
        (max_depth, TBWD_ROWS, LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    fshp = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    krow = _grad_row_len(n_geoms, n_materials)
    planes = _pad_planes(sample_idx.astype(jnp.int32), npad) + [
        # cotangents pad with zeros: vjp is linear in them
        p
        for c in range(3)
        for p in _pad_planes(g_radiance[:, c], npad)
    ]
    outs = pl.pallas_call(
        functools.partial(
            _tbwd_kernel,
            n_geoms=n_geoms, n_materials=n_materials, nee=nee, t_min=T_MIN,
            max_depth=max_depth, rr=rr, rr_start=rr_start,
            features=features, vol_nee=vol_nee,
        ),
        grid=grid,
        in_specs=[smem] * 5 + [plane] + [resid] * N_RESID + [plane] * 3,
        out_specs=tuple(
            [plane] * 6
            + [pl.BlockSpec((1, krow), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        ),
        out_shape=tuple(
            [fshp] * 6 + [jax.ShapeDtypeStruct((1, krow), jnp.float32)]
        ),
        # the unrolled reverse loop hosts max_depth in-kernel vjps; the
        # per-bounce live set is winner-replay-lean but the scheduler
        # needs headroom (cf. ops/bounce_grad.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(gdata, mdata, ldata, scal, seed, *planes[:1], *residuals, *planes[1:])

    def unp3(i):
        return jnp.stack(
            [outs[i + c].reshape(-1)[:n] for c in range(3)], axis=-1
        )

    row = outs[6][0]
    i0 = 0
    d_gdata = row[i0 : i0 + n_geoms * GDATA_COLS].reshape(n_geoms, GDATA_COLS)
    i0 += n_geoms * GDATA_COLS
    d_mdata = row[i0 : i0 + n_materials * MAT_FIELDS].reshape(
        n_materials, MAT_FIELDS
    )
    i0 += n_materials * MAT_FIELDS
    d_ldata = row[i0 : i0 + n_geoms * LDATA_COLS].reshape(n_geoms, LDATA_COLS)
    i0 += n_geoms * LDATA_COLS
    d_scal = row[i0 : i0 + 2]
    return d_gdata, d_mdata, d_ldata, d_scal, unp3(0), unp3(3)


def trace_fused_diff(scene, rays, sample_idx, base_key, cfg, interpret=None):
    """Differentiable drop-in for render/megakernel.trace_paths on
    eligible scenes: ``(radiance [N,3], rays_traced [])`` with a
    one-kernel forward and a one-kernel reverse bounce loop.

    Table packing stays differentiable outside (cotangents flow back to
    SceneParams leaves through jax's own vjp of the ``pack_*`` builders,
    and to the camera through ``d_origin``/``d_direction``)."""
    from pathtracer_tpu.ops.rng import key_to_seed

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_geoms = scene.geoms.count
    n_materials = scene.materials.count
    features = frozenset(cfg.features)
    assert "hg" not in features, "trace_fused_diff: HG excluded by eligibility"
    kw = dict(
        n_geoms=n_geoms, n_materials=n_materials, nee=cfg.nee,
        max_depth=cfg.max_depth, rr=cfg.russian_roulette,
        rr_start=cfg.rr_start, features=features, vol_nee=cfg.vol_nee,
        interpret=interpret,
    )

    gdata = _pack_gdata(scene.geoms)
    mdata = pack_material_table(scene.materials)
    ldata = pack_light_table(scene.geoms, scene.materials)
    scal = pack_scalars(scene)
    seed = key_to_seed(base_key).reshape(1)
    n = rays.origin.shape[0]

    @jax.custom_vjp
    def inner(gdata, mdata, ldata, scal, origin, direction, seed, sample_idx):
        rad, nrays, _ = _tfwd_call(
            gdata, mdata, ldata, scal, seed, origin, direction, sample_idx,
            **kw,
        )
        return rad, nrays

    def inner_fwd(gdata, mdata, ldata, scal, origin, direction, seed, sample_idx):
        rad, nrays, residuals = _tfwd_call(
            gdata, mdata, ldata, scal, seed, origin, direction, sample_idx,
            **kw,
        )
        return (rad, nrays), (gdata, mdata, ldata, scal, seed, sample_idx, residuals)

    def inner_bwd(res, g):
        gdata, mdata, ldata, scal, seed, sample_idx, residuals = res
        g_rad, _g_nrays = g  # the ray counter is a non-diff measurement
        d_gdata, d_mdata, d_ldata, d_scal, d_o, d_d = _tbwd_call(
            gdata, mdata, ldata, scal, seed, sample_idx, residuals, g_rad,
            n=n, **kw,
        )
        return d_gdata, d_mdata, d_ldata, d_scal, d_o, d_d, None, None

    inner.defvjp(inner_fwd, inner_bwd)
    return inner(
        gdata, mdata, ldata, scal, rays.origin, rays.direction, seed, sample_idx
    )
