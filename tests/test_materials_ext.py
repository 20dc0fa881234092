"""Extended material physics: Beer-Lambert absorption inside dielectrics
(ABSCOEFF, reference interactions.h:30-39 stubs) and Phong glossy
reflection (SPECEX)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.scene.parser import parse_scene_text


def make_lookup(n, **kw):
    """A MaterialLookup batch with all-default fields, keyword-overridable."""
    from pathtracer_tpu.ops.bsdf import MaterialLookup

    base = dict(
        color=jnp.zeros((n, 3)),
        specular_color=jnp.ones((n, 3)),
        has_reflective=jnp.zeros((n,)),
        has_refractive=jnp.zeros((n,)),
        ior=jnp.zeros((n,)),
        emittance=jnp.zeros((n,)),
        specular_exponent=jnp.zeros((n,)),
        absorption=jnp.zeros((n, 3)),
        has_scatter=jnp.zeros((n,)),
        scatter_coeff=jnp.zeros((n,)),
        texture_type=jnp.zeros((n,)),
        texture_scale=jnp.ones((n,)),
        texture_color2=jnp.zeros((n, 3)),
        bump_scale=jnp.zeros((n,)),
        bump_amp=jnp.zeros((n,)),
        texture_image=jnp.full((n,), -1.0),
        brdf_model=jnp.zeros((n,)),
        roughness=jnp.zeros((n,)),
        roughness_y=jnp.zeros((n,)),
        phase_g=jnp.zeros((n,)),
    )
    base.update(kw)
    return MaterialLookup(**base)

BASE = """
MATERIAL 0
RGB .8 .8 .8
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 1
RGB 0 0 0
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 1
REFRIOR 1.5
SCATTER 0
ABSCOEFF {abs}
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 2
RGB 1 1 1
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 8

CAMERA
RES 24 24
FOVY 30
ITERATIONS 1
FILE x.png
frame 0
EYE 0 2 8
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
cube
material 0
frame 0
TRANS 0 -1 0
ROTAT 0 0 0
SCALE 30 1 30

OBJECT 1
sphere
material 1
frame 0
TRANS 0 2 0
ROTAT 0 0 0
SCALE 3 3 3

OBJECT 2
cube
material 2
frame 0
TRANS 0 10 0
ROTAT 0 0 0
SCALE 10 .3 10
"""


def _render(absco, seed=0):
    desc = parse_scene_text(BASE.format(abs=absco))
    sc = desc.scene_for_frame(0)
    cfg = RenderConfig(max_depth=6, iters_per_launch=16, seed=seed)
    img, accum, _ = render(sc, 32, cfg)
    return np.asarray(accum) / 32.0


def test_beer_absorption_darkens_glass():
    clear = _render("0 0 0")
    tinted = _render(".8 .1 .1")  # absorbs red strongly
    # center pixels look through the glass sphere
    c = clear.reshape(24, 24, 3)[10:14, 10:14].mean(axis=(0, 1))
    t = tinted.reshape(24, 24, 3)[10:14, 10:14].mean(axis=(0, 1))
    assert t[0] < 0.75 * c[0], (t, c)  # red strongly absorbed
    assert t[1] > 0.75 * c[1], (t, c)  # green barely touched
    # vacuum paths (corner floor, no glass) unchanged
    np.testing.assert_allclose(
        clear.reshape(24, 24, 3)[22, 2], tinted.reshape(24, 24, 3)[22, 2], atol=1e-5
    )


def test_glossy_lobe_concentration():
    from pathtracer_tpu.ops.bsdf import sample_bsdf

    n = 20000
    def mk(specex):
        return make_lookup(
            n,
            has_reflective=jnp.ones((n,)),
            specular_exponent=jnp.full((n,), float(specex)),
        )

    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    inc = jnp.tile(jnp.array([[0.6, 0.0, -0.8]]), (n, 1))
    pos = jnp.zeros((n, 3))
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
    mirror_dir = np.array([0.6, 0.0, 0.8])

    cos_align = {}
    for e in (8.0, 128.0):
        s = sample_bsdf(mk(e), pos, normal, inc, u)
        d = np.asarray(s.direction)
        cos_align[e] = (d @ mirror_dir).mean()
        assert bool(np.asarray(s.is_specular).all())
    # higher exponent => tighter about the mirror direction
    assert cos_align[128.0] > 0.98 and cos_align[8.0] > 0.85  # E[cos a] = (n+1)/(n+2)


def test_glossy_exponent_zero_is_mirror():
    from pathtracer_tpu.ops.bsdf import sample_bsdf

    n = 64
    mat = make_lookup(n, has_reflective=jnp.ones((n,)))
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    inc = jnp.tile(jnp.array([[0.6, 0.0, -0.8]]), (n, 1))
    u = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    s = sample_bsdf(mat, jnp.zeros((n, 3)), normal, inc, u)
    np.testing.assert_allclose(
        np.asarray(s.direction), np.tile([[0.6, 0.0, 0.8]], (n, 1)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(s.throughput_mult), 1.0, atol=1e-6)


def test_volumetric_scattering_changes_transport():
    """SCATTER/RSCTCOEFF: a milky (scattering) glass sphere redistributes
    light diffusely; the render stays finite and differs from clear glass,
    and vacuum-only paths are untouched."""
    milky = BASE.replace("SCATTER 0\nABSCOEFF {abs}", "SCATTER 1\nABSCOEFF {abs}")
    milky = milky.replace("RSCTCOEFF 0\nEMITTANCE 0\n\nMATERIAL 2", "RSCTCOEFF 2.5\nEMITTANCE 0\n\nMATERIAL 2")
    desc_clear = parse_scene_text(BASE.format(abs="0 0 0"))
    desc_milky = parse_scene_text(milky.format(abs="0 0 0"))
    assert desc_milky.materials["has_scatter"][1] == 1.0
    assert desc_milky.materials["reduced_scatter_coefficient"][1] == 2.5
    cfg = RenderConfig(max_depth=8, iters_per_launch=16)
    _, a_clear, _ = render(desc_clear.scene_for_frame(0), 16, cfg)
    _, a_milky, _ = render(desc_milky.scene_for_frame(0), 16, cfg)
    a_clear = np.asarray(a_clear).reshape(24, 24, 3) / 16.0
    a_milky = np.asarray(a_milky).reshape(24, 24, 3) / 16.0
    assert np.isfinite(a_milky).all()
    # the sphere interior looks different under scattering
    assert np.abs(a_milky[10:14, 10:14] - a_clear[10:14, 10:14]).mean() > 0.01
    # a zero scatter coefficient means no scatter events: transport is
    # bit-identical to the clear scene everywhere (vacuum paths untouched
    # even with volumetric NEE in the graph)
    zero = milky.replace("RSCTCOEFF 2.5", "RSCTCOEFF 0")
    desc_zero = parse_scene_text(zero.format(abs="0 0 0"))
    _, a_zero, _ = render(desc_zero.scene_for_frame(0), 16, cfg)
    a_zero = np.asarray(a_zero).reshape(24, 24, 3) / 16.0
    np.testing.assert_allclose(a_zero, a_clear, atol=1e-5)


def test_texture_and_bump_dsl_parsing():
    txt = BASE.format(abs="0 0 0").replace(
        "RGB .8 .8 .8",
        "RGB .8 .8 .8",
    ).replace(
        """SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 1""",
        """SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0
TEXTURE checker 2 .1 .2 .3
BUMP 10 .4

MATERIAL 1""",
        1,
    )
    d = parse_scene_text(txt)
    assert d.materials["texture_type"][0] == 1.0
    assert d.materials["texture_scale"][0] == 2.0
    np.testing.assert_allclose(d.materials["texture_color2"][0], [0.1, 0.2, 0.3])
    assert d.materials["bump_scale"][0] == 10.0
    assert d.materials["bump_amp"][0] == pytest.approx(0.4)
    # untextured materials keep defaults
    assert d.materials["texture_type"][1] == 0.0


def test_checker_texture_in_render():
    """A checkered floor under NEE direct light shows two albedo
    populations where the plain floor shows one."""
    tex = BASE.format(abs="0 0 0").replace(
        """RSCTCOEFF 0
EMITTANCE 0

MATERIAL 1""",
        """RSCTCOEFF 0
EMITTANCE 0
TEXTURE checker 1 .05 .05 .05

MATERIAL 1""",
        1,
    )
    d_plain = parse_scene_text(BASE.format(abs="0 0 0"))
    d_tex = parse_scene_text(tex)
    cfg = RenderConfig(max_depth=2, iters_per_launch=8, jitter=False)
    _, a_plain, _ = render(d_plain.scene_for_frame(0), 8, cfg)
    _, a_tex, _ = render(d_tex.scene_for_frame(0), 8, cfg)
    a_plain = np.asarray(a_plain).reshape(24, 24, 3)[20:, :, 0].ravel()
    a_tex = np.asarray(a_tex).reshape(24, 24, 3)[20:, :, 0].ravel()
    lit_p = a_plain[a_plain > 1e-5]
    lit_t = a_tex[a_tex > 1e-5]
    # textured floor: strongly bimodal => higher relative spread
    assert np.std(lit_t) / (np.mean(lit_t) + 1e-9) > 2.0 * np.std(lit_p) / (np.mean(lit_p) + 1e-9)


# ---------------------------------------------------------------------------
# Cook-Torrance GGX microfacet BRDF (elective, reference README.md:54)
# ---------------------------------------------------------------------------


def test_cooktorrance_dsl_parse():
    ct = BASE.format(abs="0 0 0").replace(
        "RSCTCOEFF 0\nEMITTANCE 0\n\nMATERIAL 1",
        "RSCTCOEFF 0\nEMITTANCE 0\nBRDF cooktorrance 0.3\n\nMATERIAL 1",
        1,
    )
    desc = parse_scene_text(ct)
    assert desc.materials["brdf_model"][0] == 1.0
    assert desc.materials["roughness"][0] == pytest.approx(0.3)
    assert desc.materials["brdf_model"][1] == 0.0
    # unknown model rejected
    from pathtracer_tpu.scene.parser import SceneParseError

    bad = ct.replace("BRDF cooktorrance 0.3", "BRDF blinn 0.3")
    with pytest.raises(SceneParseError):
        parse_scene_text(bad)


def test_cooktorrance_lobe_concentration_and_energy():
    """Lower roughness => tighter lobe about the mirror direction; the
    estimator weight's mean (directional albedo at F0=1) stays <= 1."""
    from pathtracer_tpu.ops.bsdf import sample_bsdf

    n = 20000
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    inc = jnp.tile(jnp.array([[0.6, 0.0, -0.8]]), (n, 1))
    pos = jnp.zeros((n, 3))
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
    mirror_dir = np.array([0.6, 0.0, 0.8])

    stats = {}
    for r in (0.08, 0.5):
        mat = make_lookup(
            n,
            has_reflective=jnp.ones((n,)),
            brdf_model=jnp.ones((n,)),
            roughness=jnp.full((n,), r),
        )
        s = sample_bsdf(mat, pos, normal, inc, u)
        d = np.asarray(s.direction)
        w = np.asarray(s.throughput_mult)
        assert np.isfinite(d).all() and np.isfinite(w).all()
        assert bool(np.asarray(s.is_specular).all())
        stats[r] = ((d @ mirror_dir).mean(), w.mean())
    cos_smooth, alb_smooth = stats[0.08]
    cos_rough, alb_rough = stats[0.5]
    assert cos_smooth > 0.99 > cos_rough
    # directional albedo (F0 = 1): <= 1 (single-scatter loss), > 0.5
    for alb in (alb_smooth, alb_rough):
        assert 0.5 < alb <= 1.01
    # rough surface loses more energy to masking/shadowing
    assert alb_rough < alb_smooth


def test_cooktorrance_render_differs_from_mirror():
    """End-to-end: auto_features enables the microfacet lobe from the DSL;
    a rough CT floor blurs what a mirror floor reflects sharply."""
    mirror = BASE.format(abs="0 0 0").replace(
        "RGB .8 .8 .8\nSPECEX 0\nSPECRGB 1 1 1\nREFL 0",
        "RGB 0 0 0\nSPECEX 0\nSPECRGB 1 1 1\nREFL 1",
        1,
    )
    ct = mirror.replace(
        "RSCTCOEFF 0\nEMITTANCE 0\n\nMATERIAL 1",
        "RSCTCOEFF 0\nEMITTANCE 0\nBRDF cooktorrance 0.4\n\nMATERIAL 1",
        1,
    )
    d_mirror = parse_scene_text(mirror)
    d_ct = parse_scene_text(ct)
    assert d_ct.materials["brdf_model"][0] == 1.0
    cfg = RenderConfig(max_depth=4, iters_per_launch=8)
    _, a_m, _ = render(d_mirror.scene_for_frame(0), 16, cfg)
    _, a_c, _ = render(d_ct.scene_for_frame(0), 16, cfg)
    a_m = np.asarray(a_m) / 16.0
    a_c = np.asarray(a_c) / 16.0
    assert np.isfinite(a_c).all()
    # images must genuinely differ (the lobe is doing something)
    assert np.abs(a_c - a_m).mean() > 1e-3


# ---------------------------------------------------------------------------
# Ward anisotropic BRDF (elective, reference README.md:54 "Ward")
# ---------------------------------------------------------------------------


def test_ward_dsl_parse():
    w = BASE.format(abs="0 0 0").replace(
        "RSCTCOEFF 0\nEMITTANCE 0\n\nMATERIAL 1",
        "RSCTCOEFF 0\nEMITTANCE 0\nBRDF ward 0.1 0.4\n\nMATERIAL 1",
        1,
    )
    desc = parse_scene_text(w)
    assert desc.materials["brdf_model"][0] == 2.0
    assert desc.materials["roughness"][0] == pytest.approx(0.1)
    assert desc.materials["roughness_y"][0] == pytest.approx(0.4)
    # single-alpha form is isotropic
    iso = w.replace("BRDF ward 0.1 0.4", "BRDF ward 0.25")
    d2 = parse_scene_text(iso)
    assert d2.materials["roughness"][0] == pytest.approx(0.25)
    assert d2.materials["roughness_y"][0] == pytest.approx(0.25)
    # ward scenes resolve both microfacet features
    from pathtracer_tpu.render.diff import features_for_materials
    from pathtracer_tpu.scene.structs import Materials

    mats = Materials(**{k: jnp.asarray(v) for k, v in desc.materials.items()})
    feats = features_for_materials(mats)
    assert "microfacet" in feats and "ward" in feats


def test_ward_lobe_concentration_and_anisotropy():
    """Smaller alpha => tighter lobe about the mirror direction; with
    alpha_y >> alpha_x the scattered directions spread wider along the
    t2 tangent than t1 (the definition of anisotropy); the estimator
    weight at rho_s = 1 stays bounded by ~1 near normal incidence."""
    from pathtracer_tpu.ops.bsdf import _kutz_frame, sample_bsdf

    n = 20000
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    inc = jnp.tile(jnp.array([[0.3, 0.0, -0.954]]), (n, 1))
    inc = inc / jnp.linalg.norm(inc, axis=-1, keepdims=True)
    pos = jnp.zeros((n, 3))
    u = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    mirror_dir = np.asarray(inc[0] - 2 * inc[0][2] * jnp.array([0.0, 0.0, 1.0]))

    def run(ax, ay):
        mat = make_lookup(
            n,
            has_reflective=jnp.ones((n,)),
            brdf_model=jnp.full((n,), 2.0),
            roughness=jnp.full((n,), ax),
            roughness_y=jnp.full((n,), ay),
        )
        s = sample_bsdf(mat, pos, normal, inc, u)
        return np.asarray(s.direction), np.asarray(s.throughput_mult)

    d_smooth, w_smooth = run(0.05, 0.05)
    d_rough, w_rough = run(0.45, 0.45)
    assert np.isfinite(d_smooth).all() and np.isfinite(w_smooth).all()
    cos_smooth = (d_smooth @ mirror_dir).mean()
    cos_rough = (d_rough @ mirror_dir).mean()
    assert cos_smooth > 0.995 > cos_rough
    # weight sanity: mean single-scatter albedo in (0, ~1]
    assert 0.5 < w_smooth.mean() <= 1.02
    assert 0.0 < w_rough.mean() <= 1.02

    # anisotropy: alpha_y = 0.5, alpha_x = 0.05 spreads along t2, not t1
    t1, t2 = _kutz_frame(normal)
    t1 = np.asarray(t1[0])
    t2 = np.asarray(t2[0])
    d_aniso, _ = run(0.05, 0.5)
    spread_t1 = np.std(d_aniso @ t1)
    spread_t2 = np.std(d_aniso @ t2)
    assert spread_t2 > 3.0 * spread_t1


def test_ward_render_differs_from_ggx():
    """End-to-end: a Ward floor renders differently from a same-alpha GGX
    floor, and anisotropic Ward differs from isotropic Ward."""
    mirror = BASE.format(abs="0 0 0").replace(
        "RGB .8 .8 .8\nSPECEX 0\nSPECRGB 1 1 1\nREFL 0",
        "RGB 0 0 0\nSPECEX 0\nSPECRGB 1 1 1\nREFL 1",
        1,
    )
    def with_brdf(line):
        return mirror.replace(
            "RSCTCOEFF 0\nEMITTANCE 0\n\nMATERIAL 1",
            f"RSCTCOEFF 0\nEMITTANCE 0\n{line}\n\nMATERIAL 1",
            1,
        )

    cfg = RenderConfig(max_depth=4, iters_per_launch=8)

    def accum(txt):
        desc = parse_scene_text(txt)
        _, a, _ = render(desc.scene_for_frame(0), 16, cfg)
        return np.asarray(a) / 16.0

    a_ggx = accum(with_brdf("BRDF cooktorrance 0.3"))
    a_ward = accum(with_brdf("BRDF ward 0.3"))
    a_aniso = accum(with_brdf("BRDF ward 0.05 0.6"))
    for a in (a_ward, a_aniso):
        assert np.isfinite(a).all()
    assert np.abs(a_ward - a_ggx).mean() > 1e-4
    assert np.abs(a_aniso - a_ward).mean() > 1e-4


# ---------------------------------------------------------------------------
# Henyey-Greenstein anisotropic phase (PHASE g) — the final piece of the
# "physically based subsurface scattering and transmission" elective
# (reference README.md:66; the isotropic stubs are interactions.h:30-39)
# ---------------------------------------------------------------------------

HG_SCENE = """MATERIAL 0
RGB 0.9 0.9 0.9
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
RGB 0.95 0.95 0.95
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 1
REFRIOR 1.1
SCATTER 1
ABSCOEFF 0.02 0.05 0.1
RSCTCOEFF 2.0
EMITTANCE 0
PHASE {g}

CAMERA
RES 32 32
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
SCALE 2 2 2

OBJECT 1
cube
material 0
frame 0
TRANS 0 0 -6
ROTAT 0 0 0
SCALE 3 3 0.1
"""


def test_hg_sampler_statistics():
    """The HG inversion is exact: mean scattered cosine equals g (the
    defining first moment of the phase function) and directions are unit."""
    from pathtracer_tpu.ops.bsdf import henyey_greenstein

    rng = np.random.RandomState(7)
    n = 20000
    u = rng.rand(n, 2).astype(np.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    for g in (-0.7, 0.0, 0.5, 0.9):
        out = henyey_greenstein(
            d, jnp.full((n,), g), jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1])
        )
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(out, axis=-1)), 1.0, atol=1e-5
        )
        assert abs(float(jnp.mean(out[:, 2])) - g) < 0.02, g


def test_phase_parsing_and_feature_resolution():
    """PHASE populates phase_g; feature resolution adds 'hg' only when a
    scattering material is anisotropic (g=0 keeps the bit-exact isotropic
    path); out-of-range g is a parse error."""
    from pathtracer_tpu.render.diff import features_for_materials
    from pathtracer_tpu.scene.parser import SceneParseError
    from pathtracer_tpu.scene.structs import Materials

    def feats_of(txt):
        desc = parse_scene_text(txt)
        mats = Materials(
            **{k: jnp.asarray(v, jnp.float32) for k, v in desc.materials.items()}
        )
        return desc, features_for_materials(mats)

    desc, feats = feats_of(HG_SCENE.format(g=0.6))
    np.testing.assert_allclose(float(desc.materials["phase_g"][1]), 0.6, atol=1e-6)
    assert "hg" in feats
    _, feats0 = feats_of(HG_SCENE.format(g=0.0))
    assert "hg" not in feats0

    import pytest

    with pytest.raises(SceneParseError):
        parse_scene_text(HG_SCENE.format(g=1.5))


def test_hg_feature_is_exact_noop_at_zero_g():
    """Enabling the 'hg' feature on a volumetric scene whose materials all
    have g = 0 is bit-exact with the feature off: the HG direction is
    selected per lane against the uniform-sphere sample (ADVICE r3 — the
    ALL_FEATURES no-op invariant)."""
    import dataclasses

    from pathtracer_tpu.render.integrator import render as _render

    desc = parse_scene_text(HG_SCENE.format(g=0.0))
    scene = desc.scene_for_frame(0)
    base = RenderConfig(
        max_depth=6,
        auto_features=False,
        features=("volumetric",),
    )
    with_hg = dataclasses.replace(base, features=("volumetric", "hg"))
    key = jax.random.PRNGKey(5)
    _, a0, _ = _render(scene, 8, cfg=base, base_key=key)
    _, a1, _ = _render(scene, 8, cfg=with_hg, base_key=key)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))


def test_phase_without_scatter_warns():
    """PHASE on a non-scattering material is inert — the parser says so
    instead of rendering silently isotropic (ADVICE r3)."""
    import pytest

    txt = HG_SCENE.format(g=0.7).replace("SCATTER 1", "SCATTER 0")
    with pytest.warns(UserWarning, match="PHASE"):
        parse_scene_text(txt)


def test_hg_forward_scattering_transmits_more():
    """Physics: a backlit dense-scattering sphere transmits more light
    toward the camera with forward scattering (g=+0.85) than backward
    (g=-0.85) — the defining observable of phase anisotropy."""
    from pathtracer_tpu.render.integrator import render as _render

    def center_lum(g):
        desc = parse_scene_text(HG_SCENE.format(g=g))
        img, _, _ = _render(
            desc.scene_for_frame(0),
            spp=48,
            base_key=jax.random.PRNGKey(3),
            cfg=RenderConfig(max_depth=12),
        )
        return float(np.asarray(img)[12:20, 12:20].mean())

    fwd, bwd = center_lum(0.85), center_lum(-0.85)
    assert fwd > bwd * 1.2, (fwd, bwd)
