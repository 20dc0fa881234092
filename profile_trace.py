"""Trace ONLY the grad step and dump per-op device times (TPU)."""

import dataclasses
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import _trim, params_from_description, render_linear_rays
from pathtracer_tpu.scene.parser import load_scene


def main():
    res = (800, 800)
    gspp = 4
    desc = load_scene("scenes/cornell.txt")
    desc = dataclasses.replace(desc, resolution=res)
    params, static = params_from_description(desc, 0)
    cfg = _trim(RenderConfig(wavefront=False, nee=True, max_depth=8), params)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((res[0] * res[1], 3), jnp.float32)

    def loss(p):
        img, rays = render_linear_rays(p, static, gspp, key, cfg)
        return jnp.mean((img - target) ** 2), rays

    fn = jax.jit(jax.value_and_grad(loss, has_aux=True))
    out = fn(params)
    jax.block_until_ready(out[0][0])
    t0 = time.perf_counter()
    out = fn(params)
    jax.block_until_ready(out[0][0])
    print(f"step: {(time.perf_counter()-t0)*1e3:.1f} ms")

    os.system("rm -rf /tmp/jaxtrace")
    with jax.profiler.trace("/tmp/jaxtrace"):
        out = fn(params)
        jax.block_until_ready(out[0][0])

    pb = glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True)
    print(pb)


if __name__ == "__main__":
    main()
