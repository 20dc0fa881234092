"""Breakdown profiler for the fwd+bwd step at the BASELINE config.

Times, on the real chip:
  A. fast primal forward (custom_vjp fwd = fused Pallas path), spp iters
  B. lean-graph forward alone (grad_lean cfg, what the bwd re-traces)
  C. full value_and_grad step (what bench.py reports)
So  C - B - A ~= cost of the transpose + residual traffic.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import (
    l2_loss_rays,
    loss_and_grad_rays,
    params_from_description,
    build_scene,
    render_linear_rays,
    _trim,
)
from pathtracer_tpu.scene.parser import load_scene


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import sys

    res = (800, 800)
    gspp = 4
    desc = load_scene("scenes/cornell.txt")
    desc = dataclasses.replace(desc, resolution=res)
    params, static = params_from_description(desc, 0)
    cfg = RenderConfig(wavefront=False, nee=True, max_depth=8)
    cfg = _trim(cfg, params)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((res[0] * res[1], 3), jnp.float32)

    # A: fast primal (what custom_vjp's fwd runs)
    fwd = jax.jit(lambda p: render_linear_rays(p, static, gspp, key, cfg))
    dt_a, (img, rays) = timeit(fwd, params)
    rays = float(rays)
    print(f"A fast-primal fwd: {dt_a*1e3:8.1f} ms  {rays/dt_a/1e6:8.1f} Mrays/s")

    # B: lean-graph forward alone (the graph the bwd re-traces)
    from pathtracer_tpu.render.integrator import render_sample

    cfg_bwd = dataclasses.replace(cfg, fused=False, grad_lean=True, debug=False)
    scene = build_scene(params, static)
    n = res[0] * res[1]
    pix = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def lean_fwd(scene):
        def one(carry, it):
            rad, _ = render_sample(scene, pix, it, key, cfg_bwd)
            return carry + rad, None

        acc, _ = jax.lax.scan(one, jnp.zeros((n, 3), jnp.float32), jnp.arange(gspp))
        return acc

    dt_b, _ = timeit(lean_fwd, scene)
    print(f"B lean fwd (x{gspp}): {dt_b*1e3:8.1f} ms  {rays/dt_b/1e6:8.1f} Mrays/s")

    # C: full value_and_grad (bench number)
    dt_c = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        loss, grads, grays = loss_and_grad_rays(params, static, target, gspp, key, cfg)
        jax.block_until_ready(loss)
        dt_c = min(dt_c, time.perf_counter() - t0)
    print(f"C full fwd+bwd:    {dt_c*1e3:8.1f} ms  {rays/dt_c/1e6:8.1f} Mrays/s")
    print(f"   -> bwd-only ~ {(dt_c-dt_a)*1e3:.1f} ms; transpose-over-lean ~ {(dt_c-dt_a-dt_b)*1e3:.1f} ms")

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/jaxtrace"):
            loss, grads, grays = loss_and_grad_rays(params, static, target, gspp, key, cfg)
            jax.block_until_ready(loss)
        print("trace written to /tmp/jaxtrace")


if __name__ == "__main__":
    main()
