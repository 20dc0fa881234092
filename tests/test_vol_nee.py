"""Volumetric NEE (VERDICT r3 #6): direct-light sampling at in-medium
scatter events — convergence, consistency, and no-double-count checks.

The convergence claim is demonstrated on ``scenes/fog.txt`` (small lamp
in an index-matched fog): there the straight-line-transmittance NEE
weight is EXACT (no refraction bend, no Fresnel at an ior-1 boundary),
both estimators share one expectation, and the chance-hit estimator's
probability of even finding the lamp per scatter is ~3.5e-4 — the regime
the feature exists for.  On the dense refractive SSS scenes the NEE
weight ignores the boundary's Fresnel loss / TIR (documented
approximation), so those scenes get a mean-consistency band instead.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig


def _scene(name, res):
    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", name)
    desc = load_scene(path)
    desc = dataclasses.replace(desc, resolution=res)
    return desc.scene_for_frame(0)


def _mean_img(scene, spp, cfg, seed=0):
    from pathtracer_tpu.render.integrator import render

    _, acc, _ = render(scene, spp, cfg, base_key=jax.random.PRNGKey(seed))
    return np.asarray(acc) / spp


@pytest.mark.slow
def test_vol_nee_quarter_spp_convergence_fog():
    """fog.txt global mean: vol-NEE at S spp lands closer to the pinned
    converged value than the chance-hit estimator at 4S spp.  (The
    chance estimator's lamp-finding probability is ~3.5e-4 per scatter,
    so its mean converges from below with a heavy tail — measured r4:
    0.0042@32spp, 0.0047@1024spp, still rising toward the vol-NEE
    pinned ~0.008.)"""
    scene = _scene("fog.txt", (32, 32))
    base = RenderConfig(max_depth=8, iters_per_launch=16)
    old = dataclasses.replace(base, vol_nee=False)

    pinned = float(_mean_img(scene, 128, base, seed=9).mean())
    m_new = float(_mean_img(scene, 32, base, seed=1).mean())
    m_old = float(_mean_img(scene, 128, old, seed=1).mean())
    assert abs(m_new - pinned) < abs(m_old - pinned), (
        m_new, m_old, pinned
    )


@pytest.mark.slow
@pytest.mark.parametrize("scene_name", ["sss.txt", "milky.txt"])
def test_vol_nee_mean_consistency_refractive(scene_name):
    """On refractive-boundary media the straight-line-transmittance
    weight overestimates by the ignored Fresnel/TIR loss — the global
    mean stays within the documented approximation band of the unbiased
    chance-hit estimator's mean."""
    scene = _scene(scene_name, (40, 40))
    base = RenderConfig(max_depth=8, iters_per_launch=16)
    m_new = float(_mean_img(scene, 64, base, seed=3).mean())
    m_old = float(
        _mean_img(
            scene, 64, dataclasses.replace(base, vol_nee=False), seed=3
        ).mean()
    )
    assert abs(m_new - m_old) / max(m_old, 1e-3) < 0.15, (m_new, m_old)


def test_vol_nee_vacuum_noop(cornell):
    """Scenes without scattering media are bit-identical with vol_nee on
    or off (the block only fires at scatter events)."""
    scene = cornell.scene_for_frame(0)
    cfg = RenderConfig(max_depth=4, iters_per_launch=2)
    a_on = _mean_img(scene, 2, cfg)
    a_off = _mean_img(scene, 2, dataclasses.replace(cfg, vol_nee=False))
    np.testing.assert_array_equal(a_on, a_off)


THIN_SLAB = """MATERIAL 0
RGB .9 .9 .85
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 8

MATERIAL 1
RGB 1 1 1
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 1
REFRIOR 1.0
SCATTER 1
ABSCOEFF .02 .02 .02
RSCTCOEFF 0.5
EMITTANCE 0

CAMERA
RES 24 24
FOVY 35
ITERATIONS 1
FILE out.bmp
frame 0
EYE 0 0 6
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
sphere
material 1
frame 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 2.4 2.4 2.4

OBJECT 1
cube
material 0
frame 0
TRANS 0 0 -6
ROTAT 0 0 0
SCALE 4 4 .2
"""


@pytest.mark.slow
def test_vol_nee_estimator_consistency_no_double_count():
    """Index-matched THIN medium with a big panel light: both estimators
    converge fast and share one expectation (no refraction bend, no
    Fresnel) — means agree to ~2%.  A double count through the
    post-scatter chain (emit state 2 broken) would inflate the vol-NEE
    mean far beyond this band (measured r4: 0.172 vs 0.171)."""
    from pathtracer_tpu.scene.parser import parse_scene_text

    desc = parse_scene_text(THIN_SLAB, name="slab")
    scene = desc.scene_for_frame(0)
    base = RenderConfig(max_depth=8, iters_per_launch=32)
    m_new = float(_mean_img(scene, 192, base, seed=1).mean())
    m_old = float(
        _mean_img(
            scene, 512, dataclasses.replace(base, vol_nee=False), seed=2
        ).mean()
    )
    assert abs(m_new - m_old) / max(m_old, 1e-3) < 0.025, (m_new, m_old)
