import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import params_from_description, loss_and_grad_rays
from pathtracer_tpu.scene.parser import load_scene

desc = load_scene('scenes/cornell.txt')
res = (128, 128)
desc = dataclasses.replace(desc, resolution=res)
params, static = params_from_description(desc, 0)
key = jax.random.PRNGKey(0)
target = jnp.zeros((res[0]*res[1], 3), jnp.float32)
# pin the default feature set on BOTH paths -> graphs model same physics
base = RenderConfig(wavefront=False, nee=True, max_depth=8, auto_features=False)

_, g_lean, _ = loss_and_grad_rays(params, static, target, 2, key,
                                  dataclasses.replace(base, grad_fused=False))
_, g_fd, _ = loss_and_grad_rays(params, static, target, 2, key, base)
for (p0, v0), (p1, v1) in zip(jax.tree_util.tree_leaves_with_path(g_lean),
                              jax.tree_util.tree_leaves_with_path(g_fd)):
    d = np.abs(np.asarray(v0) - np.asarray(v1)).max()
    s = np.abs(np.asarray(v0)).max()
    flag = "  <<< DIFF" if d > max(2e-3 * s, 1e-4) else ""
    print(f"{jax.tree_util.keystr(p0):55s} maxdiff={d:10.5f} scale={s:10.4f}{flag}", flush=True)

# headline: 800x800 d8 gspp4 fused-diff step time
res = (800, 800)
desc = dataclasses.replace(desc, resolution=res)
params, static = params_from_description(desc, 0)
target = jnp.zeros((res[0]*res[1], 3), jnp.float32)
cfg = RenderConfig(wavefront=False, nee=True, max_depth=8)
loss, grads, rays = loss_and_grad_rays(params, static, target, 4, key, cfg)
jax.block_until_ready(loss)
t0 = time.time()
loss, grads, rays = loss_and_grad_rays(params, static, target, 4, key, cfg)
jax.block_until_ready(loss)
dt = time.time() - t0
print(f"800x800 d8 gspp4 fused-diff: step={dt*1000:.0f}ms Mrays/s={float(rays)/dt/1e6:.1f}", flush=True)
