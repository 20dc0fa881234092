import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time, warnings
import numpy as np
import jax, jax.numpy as jnp
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import load_scene

warnings.simplefilter("ignore")
key = jax.random.PRNGKey(0)
for scene_file in ["scenes/textured_image.txt", "scenes/smooth_mesh.txt"]:
    desc = load_scene(scene_file)
    desc = dataclasses.replace(desc, resolution=(512, 512))
    scene = desc.scene_for_frame(0)
    for name, cfg in [
        ("wavefront-split", RenderConfig(wavefront=True, nee=True, max_depth=8, fused=False, iters_per_launch=8, wavefront_capacity=1<<18)),
        ("wavefront-fused", RenderConfig(wavefront=True, nee=True, max_depth=8, iters_per_launch=8, wavefront_capacity=1<<18)),
    ]:
        img, acc, st = render(scene, 8, cfg, base_key=key); jax.block_until_ready(acc)
        best=1e9
        for _ in range(3):
            t0=time.perf_counter()
            img, acc, st = render(scene, 32, cfg, base_key=key); jax.block_until_ready(acc)
            best=min(best, time.perf_counter()-t0)
        print(f"{scene_file} {name}: {st['rays_traced']/best/1e6:8.1f} Mrays/s  mean={float(jnp.mean(img)):.5f}", flush=True)
