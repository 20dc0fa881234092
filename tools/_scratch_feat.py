import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time, warnings
import numpy as np
import jax, jax.numpy as jnp
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import load_scene

warnings.simplefilter("ignore")
key = jax.random.PRNGKey(0)
for scene_file in ["scenes/ward.txt", "scenes/sss.txt"]:
    desc = load_scene(scene_file)
    desc = dataclasses.replace(desc, resolution=(256, 256))
    scene = desc.scene_for_frame(0)
    res = {}
    for name, cfg in [
        ("split",  RenderConfig(wavefront=True, nee=True, max_depth=8, fused=False, iters_per_launch=8)),
        ("fusedB", RenderConfig(wavefront=True, nee=True, max_depth=8, fused=True, iters_per_launch=8)),
        ("ktrace", RenderConfig(wavefront=False, nee=True, max_depth=8, iters_per_launch=8)),
    ]:
        img, acc, st = render(scene, 8, cfg, base_key=key); jax.block_until_ready(acc)
        t0=time.perf_counter()
        img, acc, st = render(scene, 32, cfg, base_key=key); jax.block_until_ready(acc)
        dt=time.perf_counter()-t0
        res[name] = (np.asarray(acc), st["rays_traced"]/dt/1e6)
        print(f"{scene_file} {name}: {st['rays_traced']/dt/1e6:8.1f} Mrays/s  mean={np.asarray(acc).mean():.5f}", flush=True)
    for a, b in [("split","fusedB"), ("split","ktrace")]:
        d = np.abs(res[a][0]-res[b][0]).max(); s = np.abs(res[a][0]).max()
        print(f"  {a} vs {b}: max abs diff {d:.3e} (scale {s:.1f})", flush=True)
