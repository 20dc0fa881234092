"""Bisect the fwd+bwd transpose cost: time value_and_grad variants."""

import dataclasses
import time

import jax
import jax.numpy as jnp

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import (
    SceneParams,
    _trim,
    build_scene,
    params_from_description,
    render_linear_rays,
)
from pathtracer_tpu.scene.parser import load_scene


def step_time(params, static, cfg, gspp, key, target, label, params_filter=None):
    def loss(p):
        img, rays = render_linear_rays(p, static, gspp, key, cfg)
        return jnp.mean((img - target) ** 2), rays

    if params_filter is not None:
        full = params

        def loss2(sub):
            p = params_filter(full, sub)
            return loss(p)

        sub0 = params_filter(full, None)
        fn = jax.jit(jax.value_and_grad(loss2, has_aux=True))
        arg = sub0
    else:
        fn = jax.jit(jax.value_and_grad(loss, has_aux=True))
        arg = params
    (l, rays), g = fn(arg)
    jax.block_until_ready(l)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(arg)
        jax.block_until_ready(out[0][0])
        best = min(best, time.perf_counter() - t0)
    r = float(rays)
    print(f"{label:44s} {best*1e3:8.1f} ms  {r/best/1e6:7.1f} Mrays/s")
    return best


def main():
    res = (800, 800)
    gspp = 4
    desc = load_scene("scenes/cornell.txt")
    desc = dataclasses.replace(desc, resolution=res)
    params, static = params_from_description(desc, 0)
    base = _trim(RenderConfig(wavefront=False, nee=True, max_depth=8), params)
    print("resolved features:", base.features)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((res[0] * res[1], 3), jnp.float32)

    step_time(params, static, base, gspp, key, target, "base (bench config)")
    step_time(
        params, static, dataclasses.replace(base, nee=False, auto_features=False),
        gspp, key, target, "nee=False",
    )
    step_time(
        params, static,
        dataclasses.replace(base, features=(), auto_features=False),
        gspp, key, target, "features=()",
    )
    step_time(
        params, static, dataclasses.replace(base, russian_roulette=False),
        gspp, key, target, "russian_roulette=False",
    )
    step_time(
        params, static, dataclasses.replace(base, max_depth=4),
        gspp, key, target, "max_depth=4",
    )

    # gradient w.r.t. materials only (transforms/camera detached)
    def mats_only(full, sub):
        if sub is None:
            return full.materials
        return dataclasses.replace(
            jax.tree_util.tree_map(jax.lax.stop_gradient, full), materials=sub
        )

    step_time(params, static, base, gspp, key, target, "grads: materials only", mats_only)

    def cam_only(full, sub):
        if sub is None:
            return (full.cam_position, full.cam_view)
        d = jax.tree_util.tree_map(jax.lax.stop_gradient, full)
        return dataclasses.replace(d, cam_position=sub[0], cam_view=sub[1])

    step_time(params, static, base, gspp, key, target, "grads: camera only", cam_only)

    def xform_only(full, sub):
        if sub is None:
            return (full.translations, full.rotations, full.scales)
        d = jax.tree_util.tree_map(jax.lax.stop_gradient, full)
        return dataclasses.replace(
            d, translations=sub[0], rotations=sub[1], scales=sub[2]
        )

    step_time(params, static, base, gspp, key, target, "grads: transforms only", xform_only)


if __name__ == "__main__":
    main()
