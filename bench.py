"""Headline benchmark: Mrays/s/chip on the 800x800 Cornell workload.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline", ...}``.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
the speedup over this framework's own round-1 naive masked-megakernel
measurement on the same chip/workload (6.4 Mrays/s, recorded 2026-08-17),
i.e. "how much faster than a straightforward port-equivalent".

Workload: cornell.txt at 800x800, depth 8, NEE on, wavefront engine —
the BASELINE.md fwd+bwd config is reported in ``extra``.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

NAIVE_MEGAKERNEL_R1_MRAYS = 6.4  # round-1 masked megakernel, same chip

# non-blocking regression floors (~55% of the current measured numbers —
# a genuine regression trips the warning, chip-to-chip noise doesn't)
FWD_MRAYS_FLOOR = 300.0
FWD_BWD_MRAYS_FLOOR = 45.0  # round-3 measured 78.8 on v5e (per-bounce remat)


def main():
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.scene.parser import load_scene

    quick = "--quick" in sys.argv

    desc = load_scene("scenes/cornell.txt")
    res = (256, 256) if quick else (800, 800)
    desc = dataclasses.replace(desc, resolution=res)
    scene = desc.scene_for_frame(0)

    spp_warm, spp = (4, 8) if quick else (16, 64)
    cfg = RenderConfig(
        wavefront=True,
        nee=True,
        max_depth=8,
        iters_per_launch=spp_warm,
        wavefront_capacity=1 << 18,
    )

    # warmup / compile
    img, acc, st = render(scene, spp_warm, cfg)
    jax.block_until_ready(acc)

    t0 = time.perf_counter()
    img, acc, st = render(scene, spp, cfg)
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    fwd_mrays = st["rays_traced"] / dt / 1e6

    # fwd+bwd (differentiable mode) at the BASELINE.md config: 800x800
    # Cornell, depth 8.  Rays are MEASURED (the same alive-lane counter the
    # forward engines report, plumbed through render_linear_rays); the
    # convention is rays of ONE forward pass / wall time of the full
    # value_and_grad step (the backward recompute is not double-counted).
    from pathtracer_tpu.render.diff import (
        loss_and_grad_rays,
        params_from_description,
    )

    gres = (128, 128) if quick else (800, 800)
    gdesc = dataclasses.replace(desc, resolution=gres)
    params, static = params_from_description(gdesc, 0)
    gcfg = RenderConfig(wavefront=False, nee=True, max_depth=8)
    gspp = 2 if quick else 4
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((gres[0] * gres[1], 3), jnp.float32)
    loss, grads, grays = loss_and_grad_rays(params, static, target, gspp, key, gcfg)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    loss, grads, grays = loss_and_grad_rays(params, static, target, gspp, key, gcfg)
    jax.block_until_ready(loss)
    dt_g = time.perf_counter() - t0
    fwdbwd_mrays = float(grays) / dt_g / 1e6

    # non-blocking perf regression floors (SURVEY §4.6): flag, don't fail
    floors = {
        "fwd_Mrays_floor": FWD_MRAYS_FLOOR,
        "fwd_bwd_Mrays_floor": FWD_BWD_MRAYS_FLOOR,
        "fwd_ok": bool(quick or fwd_mrays >= FWD_MRAYS_FLOOR),
        "fwd_bwd_ok": bool(quick or fwdbwd_mrays >= FWD_BWD_MRAYS_FLOOR),
    }
    if not (floors["fwd_ok"] and floors["fwd_bwd_ok"]):
        print(
            f"WARNING: perf regression below floor: {floors}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "fwd Mrays/s/chip, 800x800 cornell d8 NEE wavefront",
                "value": round(fwd_mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(fwd_mrays / NAIVE_MEGAKERNEL_R1_MRAYS, 2),
                "extra": {
                    "fwd_bwd_Mrays_per_s": round(fwdbwd_mrays, 2),
                    "fwd_bwd_step_s": round(dt_g, 3),
                    "fwd_bwd_rays_measured": float(grays),
                    "fwd_bwd_resolution": list(gres),
                    "fwd_bwd_spp": gspp,
                    "fwd_wall_s": round(dt, 3),
                    "spp": spp,
                    "resolution": list(res),
                    "image_mean": round(float(jnp.mean(img)), 5),
                    "floors": floors,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
