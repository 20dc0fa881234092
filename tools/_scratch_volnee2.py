import sys; sys.path.insert(0, "/root/repo")
import dataclasses, re
import numpy as np
import jax
jax.config.update('jax_platforms','cpu')
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import parse_scene_text

txt = open("scenes/sss.txt").read()
for label, rs, g in [("dense-fwd", "2.5", "0.8"), ("thin-iso", "0.7", "0.0"), ("mid-iso", "1.2", "0.0")]:
    t = txt.replace("RSCTCOEFF   2.5", f"RSCTCOEFF   {rs}").replace("PHASE       0.8", f"PHASE       {g}")
    t = t.replace("RSCTCOEFF   3.0", f"RSCTCOEFF   {rs}")  # second material if present
    desc = parse_scene_text(t, name="probe")
    desc = dataclasses.replace(desc, resolution=(32, 32))
    scene = desc.scene_for_frame(0)
    for mode, cfg in [("volnee", RenderConfig(max_depth=8, iters_per_launch=4)),
                      ("chance", RenderConfig(max_depth=8, iters_per_launch=4, vol_nee=False))]:
        imgs = []
        for s in range(6):
            _, acc, _ = render(scene, 4, cfg, base_key=jax.random.PRNGKey(100+s))
            imgs.append(np.asarray(acc)/4.0)
        imgs = np.stack(imgs)
        print(f"{label} {mode}: mean={imgs.mean():.4f} std={imgs.std(axis=0).mean():.4f}", flush=True)
