import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.scene.parser import load_scene
from pathtracer_tpu.ops.bounce_pallas import bounce_fused
from pathtracer_tpu.render.common import shade_bounce
from pathtracer_tpu.scene.structs import Rays

desc = load_scene('scenes/cornell.txt')
desc = dataclasses.replace(desc, resolution=(800, 800))
scene = desc.scene_for_frame(0)
N = 800 * 800
rng = np.random.RandomState(0)
o = jnp.asarray(rng.rand(N, 3) * 8 - 4, jnp.float32)
d = jnp.asarray(rng.randn(N, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
thr = jnp.ones((N, 3), jnp.float32)
med = jnp.zeros((N, 4), jnp.float32)
sample_idx = jnp.arange(N, dtype=jnp.int32)
pspec = jnp.zeros((N,), bool)
key = jax.random.PRNGKey(0)
cfg = RenderConfig(nee=True)

@jax.jit
def one(o, d, thr, med):
    r = bounce_fused(scene, o, d, thr, sample_idx, 2, pspec, med, key, cfg)
    return r.contrib, r.next_origin, r.next_direction, r.throughput_mult, r.next_medium

out = one(o, d, thr, med); jax.block_until_ready(out)
best = 1e9
for _ in range(10):
    t0 = time.perf_counter(); out = one(o, d, thr, med); jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"single fused bounce kernel call @640k lanes: {best*1000:.2f} ms", flush=True)

# 8 chained bounces in one jit (the megakernel inner loop shape)
@jax.jit
def chain(o, d, thr, med):
    acc = jnp.zeros((N, 3), jnp.float32)
    pv = pspec
    for dep in range(8):
        r = bounce_fused(scene, o, d, thr, sample_idx, dep, pv, med, key, cfg)
        acc = acc + r.contrib
        o, d, thr, med, pv = r.next_origin, r.next_direction, thr * r.throughput_mult, r.next_medium, r.was_specular
    return acc

out = chain(o, d, thr, med); jax.block_until_ready(out)
best = 1e9
for _ in range(5):
    t0 = time.perf_counter(); out = chain(o, d, thr, med); jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"8 chained fused bounces (one jit): {best*1000:.2f} ms = {best/8*1000:.2f} ms/bounce", flush=True)
