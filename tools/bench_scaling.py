"""Scaling-efficiency harness (BASELINE.md "scaling efficiency" row).

Real multi-host TPU hardware is not available in this environment, so this
measures everything that CAN be measured here, on the 8-device virtual CPU
mesh (the same rig the sharding tests use):

* **per-device ray balance** — rays traced by each device under the
  strided pixel-ownership layout.  On real hardware this is the quantity
  that bounds scaling efficiency (the forward pass has zero collectives,
  so efficiency ~= balance); the BASELINE >=80% target translates to
  ``min/max >= 0.8``.
* **contiguous-tiles counterexample** — the same workload with block
  pixel ownership, demonstrating why striding is the design (SURVEY §7).
* **sharded == single-device equality** — the correctness precondition
  for calling the sharded number a speedup at all.

Prints one JSON line per metric.  Run: ``python bench_scaling.py``.
"""

import json
import os
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np


def main():
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.parallel.mesh import make_mesh
    from pathtracer_tpu.parallel.sharded import (
        gather_image,
        per_device_ray_counts,
        render_sharded,
    )
    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.scene.parser import load_scene

    here = os.path.dirname(os.path.abspath(__file__))
    desc = load_scene(os.path.join(here, "scenes", "cornell.txt"))
    desc = dataclasses.replace(desc, resolution=(128, 128))
    scene = desc.scene_for_frame(0)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    spp = 8
    cfg = RenderConfig(max_depth=8, iters_per_launch=spp)

    lines = []

    # ---- per-device ray balance, strided ownership (the product layout)
    counts = per_device_ray_counts(scene, spp, cfg, mesh)
    balance = float(counts.min() / counts.max())
    lines.append(
        {
            "metric": "ray_balance_strided",
            "value": round(balance, 4),
            "unit": "min_over_max",
            "vs_baseline": round(balance / 0.8, 3),  # >=1 meets the >=80% row
            "extra": {
                "devices": n_dev,
                "rays_per_device": [float(c) for c in counts],
            },
        }
    )

    # ---- counterexample: contiguous-tile ownership (what striding fixes).
    # Simulated by measuring per-tile ray demand from the strided counts'
    # accumulator: render each contiguous 1/D block as its own "device"
    # sample set via pixel_index restriction on the megakernel engine.
    from pathtracer_tpu.render.integrator import render_sample

    w, h = scene.camera.width, scene.camera.height
    n_pix = w * h
    block = n_pix // n_dev
    tile_counts = []
    key = jax.random.PRNGKey(cfg.seed)

    @jax.jit
    def tile_rays(pix):
        total = jnp.float32(0.0)
        for it in range(spp):
            _, n = render_sample(
                scene, pix, jnp.asarray(it, jnp.int32), key, cfg,
                n_global_pixels=n_pix,
            )
            total = total + n
        return total

    for d in range(n_dev):
        pix = jnp.arange(d * block, (d + 1) * block, dtype=jnp.int32)
        tile_counts.append(float(tile_rays(pix)))
    tile_counts = np.asarray(tile_counts)
    tile_balance = float(tile_counts.min() / tile_counts.max())
    lines.append(
        {
            "metric": "ray_balance_contiguous_tiles",
            "value": round(tile_balance, 4),
            "unit": "min_over_max",
            "vs_baseline": round(tile_balance / 0.8, 3),
            "extra": {"rays_per_tile": [float(c) for c in tile_counts]},
        }
    )

    # ---- sharded == single-device (correctness precondition)
    img_s, _, _ = render_sharded(scene, spp, cfg, mesh)
    img_1, _, _ = render(scene, spp, cfg)
    max_err = float(jnp.abs(img_s - img_1).max())
    lines.append(
        {
            "metric": "sharded_vs_single_max_abs_err",
            "value": max_err,
            "unit": "tonemapped_pixel_delta",
            "vs_baseline": 1.0 if max_err < 1e-5 else 0.0,
        }
    )

    for line in lines:
        print(json.dumps(line))
    ok = balance >= 0.8 and max_err < 1e-5
    if not ok:
        print(json.dumps({"metric": "scaling_ok", "value": 0.0, "unit": "bool"}))
        raise SystemExit(1)


if __name__ == "__main__":
    main()
