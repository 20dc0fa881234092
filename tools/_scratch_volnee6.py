import sys; sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax
jax.config.update('jax_platforms','cpu')
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import parse_scene_text

SLAB = """MATERIAL 0
RGB .9 .9 .85
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 8

MATERIAL 1
RGB 1 1 1
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 1
REFRIOR 1.0
SCATTER 1
ABSCOEFF .02 .02 .02
RSCTCOEFF 0.5
EMITTANCE 0

CAMERA
RES 24 24
FOVY 35
ITERATIONS 1
FILE out.bmp
frame 0
EYE 0 0 6
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
sphere
material 1
frame 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 2.4 2.4 2.4

OBJECT 1
cube
material 0
frame 0
TRANS 0 0 -6
ROTAT 0 0 0
SCALE 4 4 .2
"""
desc = parse_scene_text(SLAB, name="slab")
scene = desc.scene_for_frame(0)
base = RenderConfig(max_depth=8, iters_per_launch=32)
old = dataclasses.replace(base, vol_nee=False)
for label, cfg, spp in [("volnee", base, 256), ("chance", old, 1024)]:
    ms = []
    for s in (1, 2):
        _, acc, _ = render(scene, spp, cfg, base_key=jax.random.PRNGKey(s))
        ms.append(float(np.asarray(acc).mean())/spp)
    print(f"{label}@{spp}: {ms[0]:.5f} {ms[1]:.5f}", flush=True)
# fog quarter-spp global means
desc = parse_scene_text(open("scenes/fog.txt").read(), name="fog")
desc = dataclasses.replace(desc, resolution=(32,32))
scene = desc.scene_for_frame(0)
for label, cfg, spp in [("fog-volnee", base, 16), ("fog-volnee", base, 32)]:
    ms = []
    for s in (1,2,3):
        _, acc, _ = render(scene, spp, cfg, base_key=jax.random.PRNGKey(s))
        ms.append(float(np.asarray(acc).mean())/spp)
    print(f"{label}@{spp}: " + " ".join(f"{m:.5f}" for m in ms), flush=True)
