import sys; sys.path.insert(0, "/root/repo")
import dataclasses, os
import numpy as np
import jax
jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import load_scene

for name in ["sss.txt", "milky.txt"]:
    desc = load_scene(f"scenes/{name}")
    desc = dataclasses.replace(desc, resolution=(32, 32))
    scene = desc.scene_for_frame(0)
    for label, cfg in [("volnee", RenderConfig(max_depth=8, iters_per_launch=4)),
                       ("chance", RenderConfig(max_depth=8, iters_per_launch=4, vol_nee=False))]:
        imgs = []
        for s in range(6):
            _, acc, _ = render(scene, 4, cfg, base_key=jax.random.PRNGKey(100+s))
            imgs.append(np.asarray(acc)/4.0)
        imgs = np.stack(imgs)
        std = imgs.std(axis=0).mean()
        print(f"{name} {label}: mean={imgs.mean():.4f}  per-pixel std @4spp={std:.4f}", flush=True)
