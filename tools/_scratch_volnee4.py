import sys; sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax
jax.config.update('jax_platforms','cpu')
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import load_scene

desc = load_scene("scenes/fog.txt")
desc = dataclasses.replace(desc, resolution=(32, 32))
scene = desc.scene_for_frame(0)
base = RenderConfig(max_depth=8, iters_per_launch=16)
old = dataclasses.replace(base, vol_nee=False)
for label, cfg, spps in [("volnee", base, [8, 32, 128]), ("chance", old, [32, 128, 512, 1024])]:
    for spp in spps:
        ms = []
        for s in (1, 2):
            _, acc, _ = render(scene, spp, cfg, base_key=jax.random.PRNGKey(s))
            ms.append(float(np.asarray(acc).mean()) / spp)
        print(f"{label}@{spp}: {ms[0]:.5f} {ms[1]:.5f}", flush=True)
