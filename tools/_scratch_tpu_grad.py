import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import params_from_description, loss_and_grad_rays
from pathtracer_tpu.scene.parser import load_scene

print("backend", jax.default_backend(), flush=True)
desc = load_scene('scenes/cornell.txt')
res = (128, 128)
desc = dataclasses.replace(desc, resolution=res)
params, static = params_from_description(desc, 0)
key = jax.random.PRNGKey(0)
target = jnp.zeros((res[0]*res[1], 3), jnp.float32)
base = RenderConfig(wavefront=False, nee=True, max_depth=8)

for name, cfg in [("lean", dataclasses.replace(base, grad_fused=False)),
                  ("fused", base)]:
    t0 = time.time()
    loss, grads, rays = loss_and_grad_rays(params, static, target, 2, key, cfg)
    jax.block_until_ready(loss)
    print(f"{name}: loss={float(loss):.6f} compile+run={time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    loss, grads, rays = loss_and_grad_rays(params, static, target, 2, key, cfg)
    jax.block_until_ready(loss)
    dt = time.time()-t0
    print(f"{name}: step={dt*1000:.1f}ms  Mrays/s={float(rays)/dt/1e6:.1f}", flush=True)
    if name == "lean":
        g_lean, l_lean = grads, float(loss)
    else:
        from jax.flatten_util import ravel_pytree
        f0,_ = ravel_pytree(g_lean); f1,_ = ravel_pytree(grads)
        d = np.abs(np.asarray(f0)-np.asarray(f1))
        print("loss diff", abs(float(loss)-l_lean), "grad max abs diff", d.max(),
              "grad scale", np.abs(np.asarray(f0)).max(), flush=True)
