"""Headline benchmark: Mrays/s/chip across the scene-class matrix.

Prints one JSON line per scene class, then ONE final headline line
``{"metric", "value", "unit", "vs_baseline", ...}`` (the line the driver
records) whose ``extra`` carries the full matrix + the fwd+bwd number.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
the speedup over this framework's own round-1 naive masked-megakernel
measurement on the same chip/workload (6.4 Mrays/s, recorded 2026-08-17),
i.e. "how much faster than a straightforward port-equivalent".

Scene classes (VERDICT r3 #4 — quantify every path, not just the fused
Cornell configuration):

* ``cornell`` — analytic Cornell box, fully-fused bounce kernel
  (800x800, the BASELINE.md headline config)
* ``textured_image`` — PNG image textures (atlas sampling)
* ``smooth_mesh`` — OBJ triangle mesh with authored vn smooth normals
* ``ward`` — Ward anisotropic + Cook-Torrance-class BRDF lobes
* ``sss`` — dense scattering media with Henyey-Greenstein phase

Each row carries a non-blocking regression floor (~55% of the measured
number when it was set — a genuine regression trips the warning,
chip-to-chip noise doesn't).
"""

import dataclasses
import json
import sys
import time
import warnings

import jax
import jax.numpy as jnp

NAIVE_MEGAKERNEL_R1_MRAYS = 6.4  # round-1 masked megakernel, same chip

# non-blocking regression floors, ~55% of the measured numbers
FWD_MRAYS_FLOOR = 630.0  # r5 feature-gated monolith (1148 measured)
FWD_BWD_MRAYS_FLOOR = 180.0  # raised from 100: the full-depth diff
# engine (ops/trace_grad.py, winner-replay backward) measured 318-325

# (name, scene file, resolution, spp, depth, Mrays/s floor, wavefront)
# floors ~55% of measured.  Series on v5e: r4 start cornell 577 /
# textured 28 / smooth_mesh 7.4 / ward 109 / sss 81; r4 end 1019 / 34 /
# 18.6 / 309 / 221 (full-depth fused trace kernel; deferred texel;
# gather->matmul lookups).  r5: cornell 1148 / ward 351 / sss 249 (the
# kernels gate the texture/bump/volumetric blocks on cfg.features —
# plain scenes stop paying for numeric no-ops); textured_image 54.5
# (two-stage one-hot atlas fetch, ops/texture.py); smooth_mesh 35.5
# (in-kernel SMEM triangle sweep — winner, smooth vn normals, and NEE
# occlusion all inside the fused kernels, ops/bounce_pallas.py
# mesh_sweep_planes) -> 48.2 (Morton-chunked AABB culling: a chunk no
# lane can hit nearer than its winner skips its 32 triangle tests with
# one scalar branch).  The mesh/textured rows ride the megakernel
# engine since the in-kernel sweep + chunk culling made it the fastest
# engine for them too (measured 48.2 vs 35.8 / 58.1 vs 54.3 wavefront).
SCENE_MATRIX = [
    ("cornell", "scenes/cornell.txt", (800, 800), 64, 8, 630.0, False),
    ("textured_image", "scenes/textured_image.txt", (512, 512), 32, 8, 30.0, False),
    ("smooth_mesh", "scenes/smooth_mesh.txt", (512, 512), 32, 8, 26.0, False),
    ("ward", "scenes/ward.txt", (512, 512), 32, 8, 190.0, False),
    ("sss", "scenes/sss.txt", (512, 512), 32, 8, 135.0, False),
]


def bench_forward(path, res, spp, depth, quick, wavefront=True):
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.scene.parser import load_scene

    desc = load_scene(path)
    if quick:
        res = (max(res[0] // 4, 128),) * 2
        spp = max(spp // 8, 4)
    desc = dataclasses.replace(desc, resolution=res)
    scene = desc.scene_for_frame(0)
    spp_warm = max(spp // 4, 2)
    cfg = RenderConfig(
        wavefront=wavefront,
        nee=True,
        max_depth=depth,
        iters_per_launch=spp_warm,
        wavefront_capacity=1 << 18,
    )
    with warnings.catch_warnings():
        # split-path fallbacks are the *measured quantity* here, not news
        warnings.simplefilter("ignore")
        img, acc, st = render(scene, spp_warm, cfg)  # warmup / compile
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        img, acc, st = render(scene, spp, cfg)
        jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    return {
        "Mrays_per_s": round(st["rays_traced"] / dt / 1e6, 2),
        "wall_s": round(dt, 3),
        "resolution": list(res),
        "spp": spp,
        "depth": depth,
        "image_mean": round(float(jnp.mean(img)), 5),
    }


def main():
    quick = "--quick" in sys.argv

    matrix = {}
    for name, path, res, spp, depth, floor, wavefront in SCENE_MATRIX:
        row = bench_forward(path, res, spp, depth, quick, wavefront)
        row["floor_Mrays"] = floor
        row["floor_ok"] = bool(quick or row["Mrays_per_s"] >= floor)
        matrix[name] = row
        print(
            json.dumps(
                {
                    "metric": f"fwd Mrays/s/chip, {name} d{depth} NEE "
                    + ("wavefront" if wavefront else "fused-trace"),
                    "value": row["Mrays_per_s"],
                    "unit": "Mrays/s",
                    "vs_baseline": round(
                        row["Mrays_per_s"] / NAIVE_MEGAKERNEL_R1_MRAYS, 2
                    ),
                    "extra": row,
                }
            )
        )
        if not row["floor_ok"]:
            print(
                f"WARNING: {name} below floor: {row['Mrays_per_s']} < {floor}",
                file=sys.stderr,
            )

    fwd_mrays = matrix["cornell"]["Mrays_per_s"]

    # fwd+bwd (differentiable mode) at the BASELINE.md config: 800x800
    # Cornell, depth 8.  Rays are MEASURED (the same alive-lane counter the
    # forward engines report, plumbed through render_linear_rays); the
    # convention is rays of ONE forward pass / wall time of the full
    # value_and_grad step (the backward recompute is not double-counted).
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.diff import (
        loss_and_grad_rays,
        params_from_description,
    )
    from pathtracer_tpu.scene.parser import load_scene

    desc = load_scene("scenes/cornell.txt")
    gres = (128, 128) if quick else (800, 800)
    gdesc = dataclasses.replace(desc, resolution=gres)
    params, static = params_from_description(gdesc, 0)
    gcfg = RenderConfig(wavefront=False, nee=True, max_depth=8)
    gspp = 2 if quick else 4
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((gres[0] * gres[1], 3), jnp.float32)
    loss, grads, grays = loss_and_grad_rays(params, static, target, gspp, key, gcfg)
    jax.block_until_ready(loss)
    # steady-state: min of 3 (a single step at ~90 ms is ~20% per-dispatch
    # host/tunnel latency; training loops amortize it)
    dt_g = float("inf")
    for _ in range(1 if quick else 3):
        t0 = time.perf_counter()
        loss, grads, grays = loss_and_grad_rays(params, static, target, gspp, key, gcfg)
        jax.block_until_ready(loss)
        dt_g = min(dt_g, time.perf_counter() - t0)
    fwdbwd_mrays = float(grays) / dt_g / 1e6

    # non-blocking perf regression floors (SURVEY §4.6): flag, don't fail
    floors = {
        "fwd_Mrays_floor": FWD_MRAYS_FLOOR,
        "fwd_bwd_Mrays_floor": FWD_BWD_MRAYS_FLOOR,
        "fwd_ok": bool(quick or fwd_mrays >= FWD_MRAYS_FLOOR),
        "fwd_bwd_ok": bool(quick or fwdbwd_mrays >= FWD_BWD_MRAYS_FLOOR),
        "matrix_ok": bool(all(r["floor_ok"] for r in matrix.values())),
    }
    if not (floors["fwd_ok"] and floors["fwd_bwd_ok"]):
        print(
            f"WARNING: perf regression below floor: {floors}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "fwd Mrays/s/chip, 800x800 cornell d8 NEE fused-trace",
                "value": fwd_mrays,
                "unit": "Mrays/s",
                "vs_baseline": round(fwd_mrays / NAIVE_MEGAKERNEL_R1_MRAYS, 2),
                "extra": {
                    "fwd_bwd_Mrays_per_s": round(fwdbwd_mrays, 2),
                    "fwd_bwd_step_s": round(dt_g, 3),
                    "fwd_bwd_rays_measured": float(grays),
                    "fwd_bwd_resolution": list(gres),
                    "fwd_bwd_spp": gspp,
                    "fwd_wall_s": matrix["cornell"]["wall_s"],
                    "spp": matrix["cornell"]["spp"],
                    "resolution": matrix["cornell"]["resolution"],
                    "image_mean": matrix["cornell"]["image_mean"],
                    "floors": floors,
                    "matrix": matrix,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
