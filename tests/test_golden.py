"""Golden-image regression tests (SURVEY.md §4.3; BASELINE.md rows
"pixel correctness allclose" and "Fresnel/DoF golden-image allclose").

The goldens in tests/golden/*.png are deterministic CPU-jit fp32 renders
(fixed seed, counter RNG) quantized to 8-bit — the analog of the
reference's only ground truth (``/root/reference/renders/GI_yes.bmp``,
README.md:30).  A deliberate physics change fails these; regenerate with
``python tests/golden/generate.py`` and review the image diff.

Also pins the reference-scene data contract end to end: parse + render
``/root/reference/scenes/sampleScene.txt`` verbatim (SURVEY.md §4.1).
"""

import os

import numpy as np
import pytest

from tests.golden.generate import (
    GOLDENS,
    REFERENCE_SAMPLE_SCENE,
    render_golden,
    render_golden_full,
)

HERE = os.path.dirname(os.path.abspath(__file__))

# save_image quantizes by truncation, so a fresh render sits ~0.5/255
# above the stored golden on average; allow 2 counts of per-pixel drift
# (XLA fusion-order jitter) and 0.8 counts on average
MAX_ABS = 2.5 / 255.0
MEAN_ABS = 0.8 / 255.0

_BY_NAME = {g[0]: g for g in GOLDENS}


def _check_golden(name):
    _, path, res, spp = _BY_NAME[name]
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    golden_path = os.path.join(HERE, "golden", f"{name}.png")
    from pathtracer_tpu.utils.imageio import load_png

    golden = load_png(golden_path).astype(np.float32) / 255.0
    img = render_golden(path, res, spp)
    assert img.shape == golden.shape, (img.shape, golden.shape)
    diff = np.abs(img - golden)
    assert diff.max() <= MAX_ABS, f"{name}: max abs diff {diff.max():.5f}"
    assert diff.mean() <= MEAN_ABS, f"{name}: mean abs diff {diff.mean():.6f}"


def test_golden_cornell_small():
    _check_golden("cornell_96")


@pytest.mark.slow
def test_golden_cornell_400ish():
    _check_golden("cornell_200")


@pytest.mark.slow
def test_golden_glass_dof():
    """Fresnel glass + thin-lens DoF (BASELINE.md "Fresnel/DoF" row)."""
    _check_golden("glass_dof_128")


def _fp32_golden_check(accum, rel=1e-5):
    """Compare a fresh linear accumulator against the stored fp32 golden;
    returns the boolean pass/fail instead of asserting (the sensitivity
    test needs the failing direction too)."""
    golden = np.load(os.path.join(HERE, "golden", "cornell_96.npy"))
    assert accum.shape == golden.shape
    return bool(np.all(np.abs(accum - golden) <= rel * (np.abs(golden) + 1e-3)))


def _png_golden_check(img):
    golden = _load_png01("cornell_96")
    diff = np.abs(img - golden)
    return bool(diff.max() <= MAX_ABS and diff.mean() <= MEAN_ABS)


def _load_png01(name):
    from pathtracer_tpu.utils.imageio import load_png

    return load_png(os.path.join(HERE, "golden", f"{name}.png")).astype(
        np.float32
    ) / 255.0


def test_golden_cornell_fp32():
    """fp32 linear-accumulator golden: pins the physics to ~1e-5 relative,
    ~3 decades tighter than the 8-bit PNGs (SURVEY.md §4.3)."""
    _, path, res, spp = _BY_NAME["cornell_96"]
    _, accum = render_golden_full(path, res, spp)
    assert _fp32_golden_check(accum), "fp32 accumulator drifted from golden"


def test_golden_fp32_catches_sub_quantum_drift():
    """A sub-quantum physics perturbation (0.15% albedo scale — ~1%
    relative on the linear accumulator after multi-bounce compounding)
    slips under the 8-bit PNG tolerance but fails the fp32 npy golden —
    proving the npy adds real sensitivity rather than duplicating the
    PNG check."""
    import dataclasses as dc

    def perturb(scene):
        mats = dc.replace(scene.materials, color=scene.materials.color * 1.0015)
        return dc.replace(scene, materials=mats)

    _, path, res, spp = _BY_NAME["cornell_96"]
    img, accum = render_golden_full(path, res, spp, scene_perturb=perturb)
    assert _png_golden_check(img), "perturbation should pass the loose PNG bound"
    assert not _fp32_golden_check(accum), "perturbation must fail the fp32 golden"


def test_reference_sample_scene_parse_contract():
    """Parse /root/reference/scenes/sampleScene.txt verbatim and pin the
    data contract (9 materials / 9 objects / camera block values —
    scene.cpp:135-263 semantics)."""
    if not os.path.exists(REFERENCE_SAMPLE_SCENE):
        pytest.skip("reference scene not present")
    from pathtracer_tpu.scene.parser import load_scene

    desc = load_scene(REFERENCE_SAMPLE_SCENE)
    assert desc.materials["emittance"].shape[0] == 9
    assert desc.geom_type.shape[0] == 9
    assert desc.frames == 2
    assert tuple(desc.resolution) == (800, 800)
    assert desc.fovy == 25.0
    assert desc.iterations == 5000
    # light panel: material 8, EMITTANCE 15 (sampleScene.txt)
    assert float(desc.materials["emittance"][8]) == 15.0
    # both frame blocks parse; in this file frame 1 repeats frame 0
    # verbatim (the reference scene is a 2-frame no-op animation)
    assert desc.translations.shape == (2, 9, 3)
    assert np.allclose(desc.translations[0], desc.translations[1])
    assert np.allclose(desc.eye[0], desc.eye[1])


@pytest.mark.slow
def test_golden_reference_sample_scene_render():
    """End-to-end: the reference's own scene file renders and matches its
    checked-in golden."""
    _check_golden("sample_scene_96")


# ---------------------------------------------------------------------------
# elective scene classes (VERDICT r3 #8): each golden is pinned AND a
# deliberate physics perturbation in that path must fail it
# ---------------------------------------------------------------------------


def _fp32_check_named(name, accum, rel=1e-5):
    golden = np.load(os.path.join(HERE, "golden", f"{name}.npy"))
    assert accum.shape == golden.shape
    return bool(np.all(np.abs(accum - golden) <= rel * (np.abs(golden) + 1e-3)))


@pytest.mark.slow
def test_golden_smooth_mesh():
    _check_golden("smooth_mesh_96")


@pytest.mark.slow
def test_golden_smooth_mesh_perturbation_fails():
    """Disturbing the authored vn normals (the smooth-shading path)
    visibly changes the render — the golden is sensitive to exactly the
    attribute machinery it pins."""
    import dataclasses as dc

    import jax.numpy as jnp

    def perturb(scene):
        m = scene.meshes[0]
        assert m.tri_norm is not None
        tilted = m.tri_norm + jnp.asarray([0.25, 0.0, 0.0])
        tilted = tilted / jnp.linalg.norm(tilted, axis=-1, keepdims=True)
        return dc.replace(
            scene, meshes=(dc.replace(m, tri_norm=tilted),) + scene.meshes[1:]
        )

    _, path, res, spp = _BY_NAME["smooth_mesh_96"]
    img = render_golden(path, res, spp, scene_perturb=perturb)
    golden = _load_png01("smooth_mesh_96")
    assert np.abs(img - golden).max() > MAX_ABS


@pytest.mark.slow
def test_golden_ward():
    _check_golden("ward_96")
    _, path, res, spp = _BY_NAME["ward_96"]
    _, accum = render_golden_full(path, res, spp)
    assert _fp32_check_named("ward_96", accum)


@pytest.mark.slow
def test_golden_ward_perturbation_fails():
    """A 10% Ward roughness change fails the fp32 golden (the
    anisotropic-lobe path is pinned)."""
    import dataclasses as dc

    def perturb(scene):
        mats = dc.replace(
            scene.materials, roughness=scene.materials.roughness * 1.1
        )
        return dc.replace(scene, materials=mats)

    _, path, res, spp = _BY_NAME["ward_96"]
    _, accum = render_golden_full(path, res, spp, scene_perturb=perturb)
    assert not _fp32_check_named("ward_96", accum)


@pytest.mark.slow
def test_golden_sss():
    _check_golden("sss_96")
    _, path, res, spp = _BY_NAME["sss_96"]
    _, accum = render_golden_full(path, res, spp)
    assert _fp32_check_named("sss_96", accum)


@pytest.mark.slow
def test_golden_sss_perturbation_fails():
    """A 5% reduced-scatter-coefficient change fails the fp32 golden (the
    volumetric free-path + vol-NEE path is pinned)."""
    import dataclasses as dc

    def perturb(scene):
        mats = dc.replace(
            scene.materials,
            reduced_scatter_coefficient=(
                scene.materials.reduced_scatter_coefficient * 1.05
            ),
        )
        return dc.replace(scene, materials=mats)

    _, path, res, spp = _BY_NAME["sss_96"]
    _, accum = render_golden_full(path, res, spp, scene_perturb=perturb)
    assert not _fp32_check_named("sss_96", accum)


@pytest.mark.slow
def test_golden_textured_image():
    _check_golden("textured_image_96")


@pytest.mark.slow
def test_golden_textured_image_perturbation_fails():
    """Tinting the texel table visibly changes the render (the atlas
    sampling path is pinned, incl. its differentiable-texel plumbing)."""
    import dataclasses as dc

    def perturb(scene):
        atlas = scene.textures
        assert atlas is not None
        return dc.replace(
            scene, textures=dc.replace(atlas, data=atlas.data * 0.8)
        )

    _, path, res, spp = _BY_NAME["textured_image_96"]
    img = render_golden(path, res, spp, scene_perturb=perturb)
    golden = _load_png01("textured_image_96")
    assert np.abs(img - golden).max() > MAX_ABS
