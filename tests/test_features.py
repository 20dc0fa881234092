"""Feature-resolution contract (ADVICE r2 + VERDICT r2 weak #4).

* ``resolve_features`` enables scene-required blocks (microfacet for
  Cook-Torrance) and trims unused ones from the concrete material table.
* An explicitly pinned (non-default) ``features`` tuple is never
  overwritten by ``auto_features``.
* ``render_motion`` resolves features like ``integrator.render`` does —
  the round-2 medium advisory: a CT scene through the motion-blur path
  used to silently shade as mirror.
* The auto fused-megakernel path warns (once) when it declines for a
  scene-author-controlled reason instead of silently dropping to the
  split per-op pipeline.
"""

import warnings

import jax
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import (
    ALL_FEATURES,
    features_for_materials,
    resolve_features,
)
from pathtracer_tpu.scene.parser import parse_scene_text

CT_SCENE = """
MATERIAL 0
RGB 0 0 0
SPECEX 0
SPECRGB 1 1 1
REFL 1
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0
BRDF cooktorrance 0.4

MATERIAL 1
RGB 1 1 1
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 6

CAMERA
RES 16 16
FOVY 35
ITERATIONS 4
FILE test.png
frame 0
EYE 0 2 6
VIEW 0 0 -1
UP 0 1 0
frame 1
EYE 0 2 5
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
cube
material 0
frame 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 6 .1 6
frame 1
TRANS 0 0.5 0
ROTAT 0 0 0
SCALE 6 .1 6

OBJECT 1
sphere
material 1
frame 0
TRANS 0 3 0
ROTAT 0 0 0
SCALE 1 1 1
frame 1
TRANS 0 3 0
ROTAT 0 0 0
SCALE 1 1 1
"""


@pytest.fixture(scope="module")
def ct_desc():
    return parse_scene_text(CT_SCENE)


def test_resolve_enables_and_trims(ct_desc):
    scene = ct_desc.scene_for_frame(0)
    feats = features_for_materials(scene.materials)
    assert "microfacet" in feats  # scene-required block enabled
    assert "volumetric" not in feats  # unused block trimmed
    cfg = resolve_features(RenderConfig(), scene.materials)
    assert cfg.features == feats


def test_explicit_features_pin_is_honored(ct_desc):
    scene = ct_desc.scene_for_frame(0)
    pinned = RenderConfig(features=("glossy",))
    assert resolve_features(pinned, scene.materials).features == ("glossy",)
    # auto_features=False also pins, even at the default tuple
    off = RenderConfig(auto_features=False)
    assert resolve_features(off, scene.materials).features == off.features


def test_tracer_fallback_returns_superset():
    """Handed tracers, features_for_materials must return the SUPERSET
    (enabling an unused feature is a no-op; dropping a used one is not)."""

    def probe(x):
        class M:
            texture_type = x
            bump_scale = x
            has_scatter = x
            absorption_coefficient = x
            specular_exponent = x
            has_reflective = x
            brdf_model = x

        feats = features_for_materials(M())
        assert feats == ALL_FEATURES
        assert "microfacet" in feats
        return x

    jax.jit(probe)(np.ones((3,), np.float32))


def test_motion_path_resolves_features(ct_desc):
    """render_motion with auto features must differ from the same render
    with the (microfacet-less) default tuple pinned — proving the motion
    path resolves features from the material table (ADVICE r2 medium)."""
    from pathtracer_tpu.render.motion import render_motion

    base = RenderConfig(max_depth=3, iters_per_launch=4)
    _, a_auto, _ = render_motion(ct_desc, 0, 4, base)
    pinned = RenderConfig(
        max_depth=3, iters_per_launch=4, auto_features=False
    )
    _, a_pin, _ = render_motion(ct_desc, 0, 4, pinned)
    a_auto, a_pin = np.asarray(a_auto), np.asarray(a_pin)
    assert np.isfinite(a_auto).all()
    assert np.abs(a_auto - a_pin).mean() > 1e-4


def test_auto_fused_decline_warns(ct_desc):
    """When pallas is active but the fused megakernel can't run — since
    r4 the only remaining precondition is the in-kernel counter-hash RNG
    — the auto path must say so."""
    from pathtracer_tpu.render.integrator import render

    scene = ct_desc.scene_for_frame(0)
    cfg = RenderConfig(
        max_depth=2, iters_per_launch=2, pallas=True, fast_rng=False
    )
    with pytest.warns(UserWarning, match="fused bounce megakernel auto-disabled"):
        render(scene, 2, cfg)


def test_auto_fused_runs_for_ct(ct_desc):
    """r4: Cook-Torrance scenes run the fused kernel without a decline
    warning (the lobes are modeled in-kernel)."""
    from pathtracer_tpu.render.integrator import render

    scene = ct_desc.scene_for_frame(0)
    cfg = RenderConfig(max_depth=2, iters_per_launch=2, pallas=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        render(scene, 2, cfg)


def test_auto_fused_silent_when_it_runs(cornell_small):
    """No decline warning on a scene the fused kernel supports."""
    from pathtracer_tpu.render.integrator import render

    cfg = RenderConfig(max_depth=2, iters_per_launch=2, pallas=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        render(cornell_small, 2, cfg)
