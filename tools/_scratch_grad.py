import sys; sys.path.insert(0, "/root/repo"); print("start", flush=True)
import jax; jax.config.update('jax_platforms','cpu'); jax.config.update('jax_default_matmul_precision','highest')
import dataclasses, numpy as np, jax.numpy as jnp, time
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.common import shade_bounce
from pathtracer_tpu.scene.structs import Rays
from pathtracer_tpu.scene.parser import load_scene

desc = load_scene('scenes/cornell.txt')
scene0 = desc.scene_for_frame(0)
N = 256
rng = np.random.RandomState(0)
o = jnp.asarray(rng.randn(N,3)*0.5, jnp.float32)
d = jnp.asarray(rng.randn(N,3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
thr = jnp.asarray(rng.rand(N,3), jnp.float32)
med = jnp.zeros((N,4), jnp.float32)
sample_idx = jnp.arange(N, dtype=jnp.int32)
pspec = jnp.zeros((N,), bool)
key = jax.random.PRNGKey(0)
base = RenderConfig(nee=True, auto_features=False, grad_lean=True)
cfg_lean = dataclasses.replace(base, grad_fused=False, pallas=False)
cfg_fd  = dataclasses.replace(base, grad_fused=True)

def make_loss(cfg):
    def loss(scene, o, d, thr, med):
        r = shade_bounce(scene, Rays(origin=o, direction=d), thr, sample_idx, 1, pspec, key, cfg, medium_sigma=med)
        return (jnp.sum(r.contrib * 1.3) + jnp.sum(r.next_origin * 0.7)
                + jnp.sum(r.next_direction * -0.3) + jnp.sum(r.throughput_mult * 0.9)
                + jnp.sum(r.next_medium * 0.4))
    return loss

print('tracing lean', flush=True); t0=time.time()
l0, g0 = jax.value_and_grad(make_loss(cfg_lean), argnums=(0,1,2,3,4), allow_int=True)(scene0, o, d, thr, med)
print('lean', float(l0), round(time.time()-t0,1), 's')
print('tracing lean', flush=True); t0=time.time()
l1, g1 = jax.value_and_grad(make_loss(cfg_fd), argnums=(0,1,2,3,4), allow_int=True)(scene0, o, d, thr, med)
print('fused', float(l1), round(time.time()-t0,1), 's')
from jax.flatten_util import ravel_pytree
f0,_ = ravel_pytree(g0); f1,_ = ravel_pytree(g1)
dd = np.abs(np.asarray(f0)-np.asarray(f1))
rel = dd/(np.abs(np.asarray(f0))+1e-5)
print('max abs diff', dd.max(), 'max rel', rel.max())
# per-arg breakdown
names = ['scene','o','d','thr','med']
for nm, a0, a1 in zip(names, g0, g1):
    fa0,_=ravel_pytree(a0); fa1,_=ravel_pytree(a1)
    m = np.abs(np.asarray(fa0)-np.asarray(fa1)).max() if fa0.size else 0.0
    print(f'  {nm}: max abs diff {m}')
