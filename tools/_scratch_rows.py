import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time, importlib
import numpy as np
import jax, jax.numpy as jnp

rows = int(sys.argv[1])
import pathtracer_tpu.ops.bounce_grad as bg
bg.BWD_ROWS = rows

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import params_from_description, loss_and_grad_rays
from pathtracer_tpu.scene.parser import load_scene

desc = load_scene('scenes/cornell.txt')
res = (800, 800)
desc = dataclasses.replace(desc, resolution=res)
params, static = params_from_description(desc, 0)
key = jax.random.PRNGKey(0)
target = jnp.zeros((res[0]*res[1], 3), jnp.float32)
cfg = RenderConfig(wavefront=False, nee=True, max_depth=8)
loss, grads, rays = loss_and_grad_rays(params, static, target, 4, key, cfg)
jax.block_until_ready(loss)
best = 1e9
for _ in range(3):
    t0 = time.time()
    loss, grads, rays = loss_and_grad_rays(params, static, target, 4, key, cfg)
    jax.block_until_ready(loss)
    best = min(best, time.time() - t0)
print(f"BWD_ROWS={rows}: step={best*1000:.0f}ms Mrays/s={float(rays)/best/1e6:.1f}", flush=True)
