import sys; sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax
jax.config.update('jax_platforms','cpu')
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import parse_scene_text

FOG = """MATERIAL 0
RGB .9 .9 .9
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 40

MATERIAL 1
RGB 1 1 1
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 1
REFRIOR 1.0
SCATTER 1
ABSCOEFF .01 .01 .01
RSCTCOEFF {rs}
EMITTANCE 0

MATERIAL 2
RGB .4 .4 .45
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

CAMERA
RES 32 32
FOVY 40
ITERATIONS 1
FILE out.bmp
frame 0
EYE 0 0 8
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
sphere
material 0
frame 0
TRANS 2 2.5 -1
ROTAT 0 0 0
SCALE .4 .4 .4

OBJECT 1
cube
material 1
frame 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 6 6 6

OBJECT 2
cube
material 2
frame 0
TRANS 0 0 -8
ROTAT 0 0 0
SCALE 14 14 .3
"""

for rs in ("0.35", "0.8"):
    desc = parse_scene_text(FOG.format(rs=rs), name="fog")
    scene = desc.scene_for_frame(0)
    for mode, cfg in [("volnee", RenderConfig(max_depth=8, iters_per_launch=4)),
                      ("chance", RenderConfig(max_depth=8, iters_per_launch=4, vol_nee=False))]:
        imgs = []
        for s in range(6):
            _, acc, _ = render(scene, 4, cfg, base_key=jax.random.PRNGKey(100+s))
            imgs.append(np.asarray(acc)/4.0)
        imgs = np.stack(imgs)
        print(f"fog rs={rs} {mode}: mean={imgs.mean():.4f} std={imgs.std(axis=0).mean():.4f}", flush=True)
