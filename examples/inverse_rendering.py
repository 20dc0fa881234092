"""Inverse rendering demo: recover a wall color from a target image.

The capability the reference GPU path tracer never had (its trace kernel
is forward-only CUDA, ``src/raytraceKernel.cu:123-159``): because every
stage here — scene assembly, intersection, shading, NEE, tone map — is a
differentiable JAX graph, ``jax.grad`` of an image loss w.r.t. scene
parameters just works, and on TPU the forward AND backward of the bounce
physics run as fused Pallas kernels (ops/bounce_grad.py).

This script renders a ground-truth Cornell box, perturbs the left wall's
albedo, and recovers it by Adam on the photometric L2 loss:

    python examples/inverse_rendering.py          # ~1 min on a v5e chip
    python examples/inverse_rendering.py --steps 40 --res 96

The same pattern optimizes ANY SceneParams leaf — material colors and
emittance, object TRS transforms, camera pose/aperture, mesh vertices,
and texture atlas texels (inverse texture painting) — see
tests/test_grad.py for per-leaf gradient checks against finite
differences.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

# runnable from a source checkout without `pip install -e .`
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import (
    loss_and_grad,
    params_from_description,
    render_linear,
)
from pathtracer_tpu.scene.parser import load_scene

# the red left wall of scenes/cornell.txt (material 2 in the DSL)
WALL_MATERIAL = 2


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scenes/cornell.txt")
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=5e-2)
    args = ap.parse_args(argv)

    desc = load_scene(args.scene)
    desc = dataclasses.replace(desc, resolution=(args.res, args.res))
    params_true, static = params_from_description(desc, 0)
    cfg = RenderConfig(wavefront=False, nee=True, max_depth=args.depth)

    # ground-truth target (linear radiance, the quantity the loss sees)
    key = jax.random.PRNGKey(0)
    target = render_linear(params_true, static, args.spp, key, cfg)
    true_color = params_true.materials.color[WALL_MATERIAL]
    print(f"true wall albedo:      {true_color}")

    # perturb the wall albedo and recover it
    start = jnp.asarray([0.2, 0.5, 0.7], jnp.float32)
    params = dataclasses.replace(
        params_true,
        materials=dataclasses.replace(
            params_true.materials,
            color=params_true.materials.color.at[WALL_MATERIAL].set(start),
        ),
    )
    print(f"perturbed wall albedo: {start}")

    opt = optax.adam(args.lr)
    # optimize ONLY the wall color: mask every other leaf's gradient
    opt_state = opt.init(params)
    for step in range(args.steps):
        # SAME key as the target: the deterministic counter RNG makes the
        # estimator reproducible, so the loss is a deterministic function
        # with an exact zero at the true parameters — no noise-variance
        # bias pulling albedos dark (the stochastic-loss pitfall).  With
        # per-step keys you'd want higher spp instead.
        loss, grads = loss_and_grad(params, static, target, args.spp, key, cfg)
        mask = jnp.zeros_like(params.materials.color).at[WALL_MATERIAL].set(1.0)
        grads = dataclasses.replace(
            jax.tree_util.tree_map(jnp.zeros_like, grads),
            materials=dataclasses.replace(
                jax.tree_util.tree_map(jnp.zeros_like, grads.materials),
                color=grads.materials.color * mask,
            ),
        )
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params = dataclasses.replace(
            params,
            materials=dataclasses.replace(
                params.materials,
                color=jnp.clip(params.materials.color, 0.0, 1.0),
            ),
        )
        if step % 10 == 0 or step == args.steps - 1:
            cur = params.materials.color[WALL_MATERIAL]
            print(
                f"step {step:3d}  loss {float(loss):.6f}  "
                f"wall {[round(float(c), 3) for c in cur]}"
            )

    recovered = params.materials.color[WALL_MATERIAL]
    err = float(jnp.max(jnp.abs(recovered - true_color)))
    print(f"recovered wall albedo: {recovered}  (max abs err {err:.3f})")
    return err


if __name__ == "__main__":
    main()
