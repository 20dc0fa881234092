"""Golden-image generator (run manually; outputs are checked in).

The reference ships golden renders as its only quality ground truth
(``/root/reference/renders/GI_no.bmp`` / ``GI_yes.bmp``, README.md:30).
This is our equivalent: deterministic CPU-jit fp32 renders at fixed
seeds, stored as 8-bit PNGs, pinned by tests/test_golden.py with
pixel-allclose bounds (SURVEY.md §4.3; BASELINE.md "pixel correctness" +
"Fresnel/DoF golden-image" rows).

Regenerate (only after a DELIBERATE physics change, with the diff
reviewed image-by-image):

    python tests/golden/generate.py
"""

import dataclasses
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, ROOT)

REFERENCE_SAMPLE_SCENE = "/root/reference/scenes/sampleScene.txt"

# (name, scene path, resolution, spp) — every entry renders with the
# megakernel engine, NEE on, depth 8, seed 0
GOLDENS = [
    ("cornell_96", os.path.join(ROOT, "scenes", "cornell.txt"), (96, 96), 16),
    ("cornell_200", os.path.join(ROOT, "scenes", "cornell.txt"), (200, 200), 32),
    ("glass_dof_128", os.path.join(ROOT, "scenes", "glass_dof.txt"), (128, 128), 32),
    ("sample_scene_96", REFERENCE_SAMPLE_SCENE, (96, 96), 16),
    # elective scene classes (VERDICT r3 #8): authored-vn mesh,
    # Ward/Cook-Torrance, SSS media, image textures
    ("smooth_mesh_96", os.path.join(ROOT, "scenes", "smooth_mesh.txt"), (96, 96), 16),
    ("ward_96", os.path.join(ROOT, "scenes", "ward.txt"), (96, 96), 16),
    ("sss_96", os.path.join(ROOT, "scenes", "sss.txt"), (96, 96), 24),
    ("textured_image_96", os.path.join(ROOT, "scenes", "textured_image.txt"), (96, 96), 16),
]


def render_golden(scene_path, resolution, spp, scene_perturb=None):
    img, _ = render_golden_full(scene_path, resolution, spp, scene_perturb)
    return img


def render_golden_full(scene_path, resolution, spp, scene_perturb=None):
    """Render a golden config; returns ``(tone-mapped image, fp32 linear
    accumulator)``.  ``scene_perturb`` (Scene -> Scene) is the hook the
    sensitivity test uses to inject a deliberate sub-quantum physics
    change."""
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.scene.parser import load_scene

    desc = load_scene(scene_path)
    desc = dataclasses.replace(desc, resolution=resolution)
    scene = desc.scene_for_frame(0)
    if scene_perturb is not None:
        scene = scene_perturb(scene)
    cfg = RenderConfig(wavefront=False, nee=True, max_depth=8, iters_per_launch=8)
    img, accum, _ = render(scene, spp, cfg)
    return np.asarray(img), np.asarray(accum, np.float32)


# goldens that ALSO store the fp32 linear accumulator as .npy: the 8-bit
# PNGs tolerate ~1% drift (quantization + XLA fusion-order jitter); the
# npy pins the physics to ~1e-5 relative (SURVEY.md §4.3)
FP32_GOLDENS = ("cornell_96", "ward_96", "sss_96")


def main():
    from pathtracer_tpu.utils.imageio import save_image

    for name, path, res, spp in GOLDENS:
        if not os.path.exists(path):
            print(f"skip {name}: {path} not present")
            continue
        img, accum = render_golden_full(path, res, spp)
        out = os.path.join(HERE, f"{name}.png")
        save_image(out, img)
        print(f"wrote {out}  mean={img.mean():.5f}")
        if name in FP32_GOLDENS:
            npy = os.path.join(HERE, f"{name}.npy")
            np.save(npy, accum)
            print(f"wrote {npy}  accum mean={accum.mean():.6f}")


if __name__ == "__main__":
    main()
