"""Fused Pallas backward (ops/bounce_grad.py) vs the gradient-lean XLA
backward: same losses, same gradients (VERDICT r3 #1).

The comparison scene is deliberately small (4 geoms / 4 materials:
area light, diffuse floor, mirror sphere, glass sphere) because the
interpret-mode vjp kernel inlines one unrolled select-chain per table row
— compile time on CPU scales with G and M.  It still exercises every
gradient path: emittance, diffuse albedo + NEE, specular mirror, Fresnel
dielectric, TRS transforms, and the camera.

Every test pins ``auto_features=False`` with an explicit feature tuple —
the optional blocks are spread across the tests (matches_lean: glossy at
depth 3; texture_bump / vol_nee_off / ct_ward: one block family each at
depth 1-2) so that each test's cold interpret-mode compile stays bounded
(the lean comparison with the full default tuple takes tens of minutes).
Engine coverage: the per-bounce custom_vjp scan (ops/bounce_grad.py) is
pinned by every test; the full-depth trace pair (ops/trace_grad.py) by
the ``fulltrace`` parametrizations of matches_lean and vol_nee_off plus
the russian_roulette test — its engine-specific machinery (residual
streaming, reverse chaining, padding) is config-independent, while the
per-block physics is shared code already pinned via the per-bounce
engine, and each fulltrace interpret compile is ~30 min cold.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig

MINI_SCENE = """MATERIAL 0
RGB 0.9 0.85 0.8
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 6

MATERIAL 1
RGB .45 .65 .85
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 2
RGB 0 0 0
SPECEX 0
SPECRGB .95 .92 .9
REFL 1
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 3
RGB 0 0 0
SPECEX 0
SPECRGB .98 .98 .98
REFL 0
REFR 1
REFRIOR 1.5
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

CAMERA
RES 40 40
FOVY 35
ITERATIONS 1
FILE out.bmp
frame 0
EYE 0 2.5 9
VIEW 0 -0.15 -1
UP 0 1 0

OBJECT 0
cube
material 0
frame 0
TRANS 0 7 0
ROTAT 0 0 0
SCALE 4 .3 4

OBJECT 1
cube
material 1
frame 0
TRANS 0 -1 0
ROTAT 0 0 0
SCALE 14 .3 14

OBJECT 2
sphere
material 2
frame 0
TRANS -1.6 0.6 0
ROTAT 0 0 0
SCALE 2.4 2.4 2.4

OBJECT 3
sphere
material 3
frame 0
TRANS 1.7 0.4 1
ROTAT 0 30 0
SCALE 2 2 2
"""


@pytest.fixture(scope="module")
def mini():
    from pathtracer_tpu.scene.parser import parse_scene_text

    return parse_scene_text(MINI_SCENE, name="mini")


@pytest.mark.slow
@pytest.mark.parametrize("full_trace", [False, True], ids=["perbounce", "fulltrace"])
def test_fused_backward_matches_lean(mini, full_trace):
    """loss_and_grad via the Pallas vjp kernels == the lean XLA backward,
    every SceneParams leaf, to fp32 reassociation tolerance — for BOTH
    fused engines: the per-bounce custom_vjp scan (ops/bounce_grad.py)
    and the full-depth one-kernel-each trace (ops/trace_grad.py)."""
    from pathtracer_tpu.render.diff import loss_and_grad, params_from_description

    params, static = params_from_description(mini, 0)
    key = jax.random.PRNGKey(7)
    n = static.resolution[0] * static.resolution[1]
    target = jnp.full((n, 3), 0.25, jnp.float32)
    # depth 3 exercises multi-bounce cotangent chaining; features trimmed
    # to the scene's own needs plus "glossy" — the LEAN comparison's
    # interpret/CPU compile with the full default block tuple takes tens
    # of minutes cold (see vol_nee_off's note), and the other blocks have
    # their own parity tests (texture_bump / vol_nee_off / ct_ward)
    base = RenderConfig(
        wavefront=False, nee=True, max_depth=3, auto_features=False,
        features=("glossy",),
    )
    l0, g0 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=False),
    )
    l1, g1 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=True, grad_full_trace=full_trace),
    )
    assert abs(float(l0) - float(l1)) <= 1e-6 * max(1.0, abs(float(l0)))

    leaves0 = jax.tree_util.tree_leaves_with_path(g0)
    leaves1 = jax.tree_util.tree_leaves_with_path(g1)
    assert len(leaves0) == len(leaves1)
    gscale = max(
        float(np.abs(np.asarray(v)).max()) for _, v in leaves0
    )
    for (p0, v0), (_, v1) in zip(leaves0, leaves1):
        d = float(np.abs(np.asarray(v0) - np.asarray(v1)).max())
        assert d <= 5e-4 * max(gscale, 1.0), (
            jax.tree_util.keystr(p0), d, gscale
        )


@pytest.mark.slow
def test_fused_backward_nee_off(mini, full_trace=False):
    """Same equality with the pure BSDF+emittance estimator (nee=False
    exercises the kernels' non-NEE compile path under vjp — the replay
    visibility plane is all-zeros there).  Per-bounce engine only: the
    physics is engine-shared (bounce_physics + _step_update), and the
    full-depth pair's own machinery (residual streaming, reverse
    chaining, padding) is pinned by matches_lean[fulltrace] /
    vol_nee_off[fulltrace] / russian_roulette — a fulltrace
    parametrization here would only re-pay its ~30 min cold interpret
    compile."""
    from pathtracer_tpu.render.diff import loss_and_grad, params_from_description

    params, static = params_from_description(mini, 0)
    key = jax.random.PRNGKey(3)
    n = static.resolution[0] * static.resolution[1]
    target = jnp.zeros((n, 3), jnp.float32)
    # features=(): this test is about the non-NEE estimator, not the
    # optional blocks — an empty tuple keeps the cold compile small
    base = RenderConfig(
        wavefront=False, nee=False, max_depth=2, auto_features=False,
        features=(),
    )
    l0, g0 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=False),
    )
    l1, g1 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=True, grad_full_trace=full_trace),
    )
    assert abs(float(l0) - float(l1)) <= 1e-6 * max(1.0, abs(float(l0)))
    f0 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g0)])
    f1 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g1)])
    scale = max(np.abs(f0).max(), 1.0)
    np.testing.assert_allclose(f1, f0, atol=5e-4 * scale)


@pytest.mark.slow
def test_fused_backward_texture_bump(mini, full_trace=False):
    """Procedural texture + bump blocks through the fused backward vs
    the lean graph (split out of matches_lean so each test's cold
    interpret compile stays in minutes; per-bounce engine only — see
    nee_off's note).  Depth 1: the blocks' gradient paths (albedo
    modulation, bumped-normal NEE cosines, continuation weights) are
    fully exercised at the first hit, and their transposes dominate the
    cold compile — multi-bounce chaining is matches_lean's job."""
    import dataclasses as _dc

    from pathtracer_tpu.render.diff import loss_and_grad, params_from_description

    desc = _dc.replace(mini, resolution=(24, 24))
    params, static = params_from_description(desc, 0)
    # material 1 (the floor) gets a checker texture + bump
    mats = _dc.replace(
        params.materials,
        texture_type=params.materials.texture_type.at[1].set(1.0),
        texture_scale=params.materials.texture_scale.at[1].set(2.0),
        texture_color2=params.materials.texture_color2.at[1].set(
            jnp.asarray([0.2, 0.8, 0.3])
        ),
        bump_scale=params.materials.bump_scale.at[1].set(6.0),
        bump_amp=params.materials.bump_amp.at[1].set(0.2),
    )
    params = _dc.replace(params, materials=mats)
    key = jax.random.PRNGKey(13)
    n = static.resolution[0] * static.resolution[1]
    target = jnp.full((n, 3), 0.25, jnp.float32)
    base = RenderConfig(
        wavefront=False, nee=True, max_depth=1, auto_features=False,
        features=("texture", "bump"),
    )
    l0, g0 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=False),
    )
    l1, g1 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=True, grad_full_trace=full_trace),
    )
    assert abs(float(l0) - float(l1)) <= 1e-6 * max(1.0, abs(float(l0)))
    f0 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g0)])
    f1 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g1)])
    scale = max(np.abs(f0).max(), 1.0)
    np.testing.assert_allclose(f1, f0, atol=5e-4 * scale)


@pytest.mark.slow
@pytest.mark.parametrize("vol_nee", [False, True], ids=["vnee0", "vnee1"])
@pytest.mark.parametrize("full_trace", [False, True], ids=["perbounce", "fulltrace"])
def test_fused_backward_vol_nee_off(full_trace, vol_nee):
    """cfg.vol_nee=False must reach the BACKWARD kernel too (ADVICE r4
    high: the flag was dropped on the bwd partial, so the backward
    differentiated vol-NEE physics the forward never computed — silently
    wrong gradients on scattering-media scenes).  Both engines; also the
    full-depth engine's medium-carry (sigma) cotangent chain."""
    from pathtracer_tpu.render.diff import loss_and_grad, params_from_description
    from pathtracer_tpu.scene.parser import parse_scene_text

    vol_text = MINI_SCENE.replace(
        "REFRIOR 1.5\nSCATTER 0\nABSCOEFF 0 0 0\nRSCTCOEFF 0",
        "REFRIOR 1.5\nSCATTER 1\nABSCOEFF 0.25 0.12 0.05\nRSCTCOEFF 1.6",
    )
    import dataclasses as _dc

    desc = parse_scene_text(vol_text, name="mini_vol")
    desc = _dc.replace(desc, resolution=(24, 24))
    params, static = params_from_description(desc, 0)
    key = jax.random.PRNGKey(11)
    n = static.resolution[0] * static.resolution[1]
    target = jnp.full((n, 3), 0.2, jnp.float32)
    # features trimmed to the block under test ("volumetric") — the full
    # default tuple made the lean backward's interpret/CPU compile take
    # tens of minutes; depth 2 covers enter-medium -> in-medium scatter
    # vol_nee=True is the NaN regression (r5): the kernels' vol-NEE
    # occlusion ran differentiable on the non-scatter lanes' ~1e30
    # vol_pos — inf/NaN intermediates poisoned the whole gradient even
    # under the candidate mask; the fix clamps the position and detaches
    # the occlusion exactly like the split path
    base = RenderConfig(
        wavefront=False, nee=True, vol_nee=vol_nee, max_depth=2,
        auto_features=False, features=("volumetric",),
    )
    l0, g0 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=False),
    )
    l1, g1 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=True, grad_full_trace=full_trace),
    )
    assert abs(float(l0) - float(l1)) <= 1e-6 * max(1.0, abs(float(l0)))
    f0 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g0)])
    f1 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g1)])
    scale = max(np.abs(f0).max(), 1.0)
    np.testing.assert_allclose(f1, f0, atol=5e-4 * scale)


@pytest.mark.slow
@pytest.mark.parametrize(
    "brdf_line", ["BRDF cooktorrance 0.35", "BRDF ward 0.2 0.5"]
)
def test_fused_backward_ct_ward(brdf_line, full_trace=False):
    """Cook-Torrance/Ward scenes take the fused vjp path (the eligibility
    gate passes them) — pin the gradients against the lean backward
    (ADVICE r4: the docs claimed they were out of scope; they are in)."""
    from pathtracer_tpu.render.diff import loss_and_grad, params_from_description
    from pathtracer_tpu.scene.parser import parse_scene_text

    # the mirror sphere (material 2, REFL 1) becomes a rough CT/Ward lobe
    # (BRDF is an extension line: it follows the fixed key block)
    mat2_block = (
        "REFL 1\nREFR 0\nREFRIOR 0\nSCATTER 0\nABSCOEFF 0 0 0\n"
        "RSCTCOEFF 0\nEMITTANCE 0"
    )
    text = MINI_SCENE.replace(mat2_block, f"{mat2_block}\n{brdf_line}")
    import dataclasses as _dc

    desc = parse_scene_text(text, name="mini_rough")
    desc = _dc.replace(desc, resolution=(24, 24))
    params, static = params_from_description(desc, 0)
    key = jax.random.PRNGKey(5)
    n = static.resolution[0] * static.resolution[1]
    target = jnp.full((n, 3), 0.3, jnp.float32)
    # features trimmed to the lobes under test (see vol_nee_off note)
    base = RenderConfig(
        wavefront=False, nee=True, max_depth=2, auto_features=False,
        features=("glossy", "microfacet", "ward"),
    )
    l0, g0 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=False),
    )
    l1, g1 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=True, grad_full_trace=full_trace),
    )
    assert abs(float(l0) - float(l1)) <= 1e-6 * max(1.0, abs(float(l0)))
    f0 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g0)])
    f1 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g1)])
    scale = max(np.abs(f0).max(), 1.0)
    np.testing.assert_allclose(f1, f0, atol=5e-4 * scale)


@pytest.mark.slow
def test_fused_backward_russian_roulette(mini):
    """Russian roulette through the full-depth trace pair vs the lean
    backward.  Regression: the kernels' RR alive-update used
    where-on-bools, which Mosaic cannot lower (arith.trunci i8->i1) —
    the boolean-algebra form compiles and the detached-p gradients
    match."""
    from pathtracer_tpu.render.diff import loss_and_grad, params_from_description

    params, static = params_from_description(mini, 0)
    key = jax.random.PRNGKey(7)
    n = static.resolution[0] * static.resolution[1]
    target = jnp.full((n, 3), 0.25, jnp.float32)
    base = RenderConfig(
        wavefront=False, nee=True, max_depth=3, auto_features=False,
        features=(), russian_roulette=True, rr_start=1,
    )
    l0, g0 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=False),
    )
    l1, g1 = loss_and_grad(
        params, static, target, 1, key,
        dataclasses.replace(base, grad_fused=True, grad_full_trace=True),
    )
    assert abs(float(l0) - float(l1)) <= 1e-6 * max(1.0, abs(float(l0)))
    f0 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g0)])
    f1 = np.concatenate([np.asarray(v).ravel() for v in jax.tree_util.tree_leaves(g1)])
    scale = max(np.abs(f0).max(), 1.0)
    np.testing.assert_allclose(f1, f0, atol=5e-4 * scale)


def test_fused_diff_eligibility(cornell):
    """The auto predicate: on for analytic scenes under the kernel's
    scope, off for meshes / textures / split-path features / slow RNG."""
    from pathtracer_tpu.render.common import fused_diff_eligible

    scene = cornell.scene_for_frame(0)
    on = RenderConfig(grad_fused=True)
    assert fused_diff_eligible(scene, on)
    assert not fused_diff_eligible(scene, dataclasses.replace(on, grad_fused=False))
    assert not fused_diff_eligible(scene, dataclasses.replace(on, fast_rng=False))
    # r4: Cook-Torrance/Ward differentiate in-kernel; HG still lean
    assert fused_diff_eligible(
        scene, dataclasses.replace(on, features=("microfacet", "ward"))
    )
    assert not fused_diff_eligible(
        scene, dataclasses.replace(on, features=("hg",))
    )
    # CPU + auto (None) stays off: interpret-mode kernels are for tests only
    auto = RenderConfig()
    if jax.default_backend() != "tpu":
        assert not fused_diff_eligible(scene, auto)
