import sys; sys.path.insert(0, "/root/repo")
import dataclasses, glob, os, time, warnings
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import load_scene
sys.path.insert(0, "/root/repo/tools")
from profile_trace import summarize

warnings.simplefilter("ignore")
scene_file = sys.argv[1]
desc = load_scene(scene_file)
desc = dataclasses.replace(desc, resolution=(256, 256))
scene = desc.scene_for_frame(0)
cfg = RenderConfig(wavefront=True, nee=True, max_depth=8, iters_per_launch=8, wavefront_capacity=1<<18)
key = jax.random.PRNGKey(0)
img, acc, st = render(scene, 8, cfg, base_key=key); jax.block_until_ready(acc)
t0=time.perf_counter(); img, acc, st = render(scene, 8, cfg, base_key=key); jax.block_until_ready(acc)
print(f"8spp wall: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
os.system("rm -rf /tmp/jaxtrace")
with jax.profiler.trace("/tmp/jaxtrace"):
    img, acc, st = render(scene, 8, cfg, base_key=key); jax.block_until_ready(acc)
pb = glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True)
summarize(pb[0], top=18)
