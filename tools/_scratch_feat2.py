import sys; sys.path.insert(0, "/root/repo")
import dataclasses, warnings
import numpy as np
import jax
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import load_scene

warnings.simplefilter("ignore")
key = jax.random.PRNGKey(0)
desc = load_scene("scenes/ward.txt")
desc = dataclasses.replace(desc, resolution=(256, 256))
scene = desc.scene_for_frame(0)
accs = {}
for name, fused in [("split", False), ("fusedB", True)]:
    cfg = RenderConfig(wavefront=True, nee=True, max_depth=8, fused=fused, iters_per_launch=8)
    img, acc, st = render(scene, 32, cfg, base_key=key)
    accs[name] = np.asarray(acc)
d = np.abs(accs["split"] - accs["fusedB"]).max(axis=-1)
rel = d / (np.abs(accs["split"]).max(axis=-1) + 1e-3)
print("lanes:", d.size, " diff>0.01:", int((d > 0.01).sum()), " diff>1:", int((d > 1.0).sum()))
print("mean rel err:", float(np.mean(d / (np.abs(accs['split']).max(axis=-1)+1.0))))
