"""Debug/observability mode (SURVEY.md §2 #15, §5 — the analog of the
reference's checkCUDAError-after-launch, raytraceKernel.cu:20-26,226):
``RenderConfig.debug`` turns on jax_debug_nans, host finite checks on the
accumulator per chunk, and a per-bounce alive-lane histogram."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render

CFG = RenderConfig(max_depth=4, nee=True, wavefront=False, debug=True, iters_per_launch=2)


def test_debug_clean_scene_renders_with_histogram(cornell_small):
    img, _, stats = render(cornell_small, 4, CFG)
    assert np.isfinite(np.asarray(img)).all()
    hist = stats["alive_per_bounce"]
    assert len(hist) == CFG.max_depth
    # every primary ray is alive at bounce 0; the wavefront decays
    n = cornell_small.camera.width * cornell_small.camera.height
    assert hist[0] == 4 * n
    assert hist[-1] < hist[0]
    assert all(a >= b for a, b in zip(hist, hist[1:])), hist


def test_debug_catches_nan_material(cornell_small):
    mats = cornell_small.materials
    bad = dataclasses.replace(
        mats, color=mats.color.at[1, 0].set(jnp.float32(jnp.nan))
    )
    scene = dataclasses.replace(cornell_small, materials=bad)
    # jax_debug_nans raises FloatingPointError at the first NaN-producing
    # op; the per-chunk accumulator check backstops it with RuntimeError
    with pytest.raises((FloatingPointError, RuntimeError)):
        render(scene, 4, CFG)


def test_no_debug_is_silent(cornell_small):
    cfg = dataclasses.replace(CFG, debug=False)
    img, _, stats = render(cornell_small, 2, cfg)
    assert "alive_per_bounce" not in stats
