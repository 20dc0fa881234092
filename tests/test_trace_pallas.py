"""Full-depth fused trace kernel (ops/trace_pallas.py) vs the per-bounce
scan megakernel: bit-compatible radiance and ray counts.

Uses the same mini scene as test_bounce_grad (small G/M keeps the
interpret-mode compile of the unrolled bounce loop manageable on CPU).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from tests.test_bounce_grad import MINI_SCENE


@pytest.fixture(scope="module")
def mini():
    from pathtracer_tpu.scene.parser import parse_scene_text

    return parse_scene_text(MINI_SCENE, name="mini")


def _render_both(scene, cfg, spp=2):
    """Render with the K-bounce kernel and with the per-bounce scan
    (eligibility monkeypatched off) — same cfg, same key."""
    from pathtracer_tpu.ops import trace_pallas
    from pathtracer_tpu.render.integrator import render

    key = jax.random.PRNGKey(11)
    img1, a1, st1 = render(scene, spp, cfg, base_key=key)

    orig = trace_pallas.fused_trace_eligible
    trace_pallas.fused_trace_eligible = lambda s, c: False
    try:
        img0, a0, st0 = render(scene, spp, cfg, base_key=key)
    finally:
        trace_pallas.fused_trace_eligible = orig
    return (a0, st0), (a1, st1)


@pytest.mark.slow
def test_ktrace_matches_scan(mini):
    """Radiance accumulator and measured ray count are identical between
    the one-kernel trace and the scan of per-bounce fused kernels."""
    scene = mini.scene_for_frame(0)
    # depth 3 / spp 2: bounds the interpret-mode K-bounce unroll's CPU
    # compile (2-core box) while covering multi-bounce state carry
    cfg = RenderConfig(
        wavefront=False, nee=True, max_depth=3, fused=True,
        iters_per_launch=2,
    )
    (a0, st0), (a1, st1) = _render_both(scene, cfg)
    np.testing.assert_allclose(
        np.asarray(a1), np.asarray(a0), rtol=2e-6, atol=2e-6
    )
    assert st0["rays_traced"] == st1["rays_traced"]


@pytest.mark.slow
def test_ktrace_matches_scan_rr_and_no_nee(mini):
    """Same equality with russian roulette on and NEE off (the two
    engine-bookkeeping branches the kernel transcribes)."""
    scene = mini.scene_for_frame(0)
    cfg = RenderConfig(
        wavefront=False, nee=False, max_depth=3, fused=True,
        russian_roulette=True, rr_start=1, iters_per_launch=2,
    )
    (a0, st0), (a1, st1) = _render_both(scene, cfg)
    np.testing.assert_allclose(
        np.asarray(a1), np.asarray(a0), rtol=2e-6, atol=2e-6
    )
    assert st0["rays_traced"] == st1["rays_traced"]


@pytest.mark.slow
def test_ktrace_matches_scan_mesh():
    """r5: SMEM-sized triangle meshes run INSIDE the one-kernel trace
    (in-kernel sweep incl. smooth vn normals + NEE occlusion) — equal to
    the per-bounce scan whose fused kernel uses the same sweep."""
    import os

    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(
        os.path.dirname(__file__), "..", "scenes", "smooth_mesh.txt"
    )
    desc = load_scene(path)
    desc = dataclasses.replace(desc, resolution=(24, 24))
    scene = desc.scene_for_frame(0)
    assert scene.meshes
    cfg = RenderConfig(
        wavefront=False, nee=True, max_depth=2, fused=True,
        iters_per_launch=1,
    )
    (a0, st0), (a1, st1) = _render_both(scene, cfg, spp=1)
    np.testing.assert_allclose(
        np.asarray(a1), np.asarray(a0), rtol=2e-6, atol=2e-6
    )
    assert st0["rays_traced"] == st1["rays_traced"]


def test_ktrace_eligibility(cornell):
    from pathtracer_tpu.ops.trace_pallas import fused_trace_eligible

    scene = cornell.scene_for_frame(0)
    cfg = RenderConfig()
    assert fused_trace_eligible(scene, cfg)
    # r4: every material feature (incl. CT/Ward/HG) is modeled in-kernel
    assert fused_trace_eligible(
        scene, dataclasses.replace(cfg, features=("microfacet", "ward", "hg"))
    )
    assert not fused_trace_eligible(
        scene, dataclasses.replace(cfg, fast_rng=False)
    )
