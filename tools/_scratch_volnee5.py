import sys; sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax
jax.config.update('jax_platforms','cpu')
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import load_scene

desc = load_scene("scenes/fog.txt")
desc = dataclasses.replace(desc, resolution=(16, 16))
scene = desc.scene_for_frame(0)
base = RenderConfig(max_depth=8, iters_per_launch=64)
old = dataclasses.replace(base, vol_nee=False)
_, a_new, _ = render(scene, 256, base, base_key=jax.random.PRNGKey(1))
_, a_old, _ = render(scene, 4096, old, base_key=jax.random.PRNGKey(2))
n = np.asarray(a_new).reshape(16,16,3).mean(-1)/256
o = np.asarray(a_old).reshape(16,16,3).mean(-1)/4096
np.set_printoptions(precision=3, suppress=True, linewidth=200)
print("volnee@256:"); print(n)
print("chance@4096:"); print(o)
print("ratio:"); print(np.where(o>1e-4, n/np.maximum(o,1e-6), 0))
