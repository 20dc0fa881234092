import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import load_scene

desc = load_scene('scenes/cornell.txt')
desc = dataclasses.replace(desc, resolution=(256, 256))
scene = desc.scene_for_frame(0)
key = jax.random.PRNGKey(0)
# equality: megakernel scan (fused per-bounce) vs K-bounce trace
cfg_scan = RenderConfig(wavefront=False, nee=True, max_depth=8, fused=True, iters_per_launch=4)
# force the scan path by monkeypatching eligibility off for the first render
import pathtracer_tpu.ops.trace_pallas as tp
orig = tp.fused_trace_eligible
tp.fused_trace_eligible = lambda s, c: False
img0, a0, st0 = render(scene, 4, cfg_scan, base_key=key)
jax.block_until_ready(a0)
tp.fused_trace_eligible = orig
img1, a1, st1 = render(scene, 4, cfg_scan, base_key=key)
jax.block_until_ready(a1)
d = np.abs(np.asarray(a0) - np.asarray(a1)).max()
print("accum max abs diff scan-vs-ktrace:", d, " scale:", np.abs(np.asarray(a0)).max())
print("rays scan:", st0["rays_traced"], " ktrace:", st1["rays_traced"])

# perf: 800x800 d8 spp64, megakernel K-trace vs wavefront engine
desc = dataclasses.replace(desc, resolution=(800, 800))
scene = desc.scene_for_frame(0)
for name, cfg in [
    ("wavefront", RenderConfig(wavefront=True, nee=True, max_depth=8, iters_per_launch=16, wavefront_capacity=1<<18)),
    ("ktrace-mega", RenderConfig(wavefront=False, nee=True, max_depth=8, iters_per_launch=16)),
]:
    img, acc, st = render(scene, 16, cfg, base_key=key); jax.block_until_ready(acc)
    best=1e9
    for _ in range(3):
        t0=time.perf_counter()
        img, acc, st = render(scene, 64, cfg, base_key=key); jax.block_until_ready(acc)
        best=min(best, time.perf_counter()-t0)
    print(f"{name}: {st['rays_traced']/best/1e6:.1f} Mrays/s  wall={best:.3f}s  mean={float(jnp.mean(img)):.5f}", flush=True)
